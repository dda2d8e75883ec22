"""Fused upsample+conv decoder forward for the full U-Net — serving AND,
since round 5, training (the identity is exact, hence differentiable:
train.py --fused_decoder; gradient parity in tests/test_unet_infer.py).

The training-time decoder (models/full_unet.py:125-131, mirroring the
reference's export topology, reference export/generator/metadata.json)
materializes a nearest-neighbor 2x upsample and then runs a k=3 conv over
the doubled length. On TPU that upsample shows up as a *broadcast* HLO
moving the full [B, 2L, C] activation through HBM (4.4% of the measured
serving step at the batch-512 sweet spot,
results/op_table_serve_unfused.json), and the k=3 conv on the
duplicated samples does redundant work: with u[2i] = u[2i+1] = h[i],

    y[2i]   = w0*u[2i-1] + w1*u[2i] + w2*u[2i+1] = w0*h[i-1] + (w1+w2)*h[i]
    y[2i+1] = w0*u[2i]   + w1*u[2i+1] + w2*u[2i+2] = (w0+w1)*h[i] + w2*h[i+1]

so the upsample+conv pair is EXACTLY two k=2 convolutions on the
*un-upsampled* h (one for even outputs, one for odd), interleaved — the
standard transposed-convolution identity, applied here in reverse. That is
8*Cin*Cout*L MACs instead of 12*Cin*Cout*L, no materialized upsample, and
both halves stay dense MXU convolutions.

``make_unet_infer_apply`` builds a jittable forward with this decoder (and
optional bf16 activation/param storage) from the STANDARD FullUNetGenerator
param tree — any trained checkpoint evaluates under it unchanged.
Numerical equivalence to the reference forward is asserted by
tests/test_unet_infer.py (the only difference is (w0+w1) being summed
before the MXU accumulation instead of inside it).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.nn import leaky_relu


def _conv(h: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
          stride: int = 1, padding=((1, 1),)) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        h, kernel, window_strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + bias


def _upconv_fused(h: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray) -> jnp.ndarray:
    """upsample_nearest_2x -> conv(k=3, pad 1) as two interleaved k=2 convs.

    kernel: [3, Cin, Cout] (the trained dec*_1 kernel). Output length is
    2 * h.shape[1], identical to conv(upsample(h)).
    """
    w0, w1, w2 = kernel[0], kernel[1], kernel[2]
    # even outputs y[2i] = w0*h[i-1] + (w1+w2)*h[i]  -> k=2, pad (1, 0)
    k_even = jnp.stack([w0, w1 + w2])
    # odd outputs y[2i+1] = (w0+w1)*h[i] + w2*h[i+1] -> k=2, pad (0, 1)
    k_odd = jnp.stack([w0 + w1, w2])
    even = jax.lax.conv_general_dilated(
        h, k_even, window_strides=(1,), padding=((1, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"))
    odd = jax.lax.conv_general_dilated(
        h, k_odd, window_strides=(1,), padding=((0, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"))
    b, l, c = even.shape
    out = jnp.stack([even, odd], axis=2).reshape(b, 2 * l, c)
    return out + bias


def make_full_critic_apply(levels: int = 5,
                           leaky_slope: float = 0.2,
                           act_dtype: Any = jnp.bfloat16) -> Callable:
    """Functional ``apply(params, candidate, condition)`` for the
    FullDiscriminator param tree with ``act_dtype`` activation/operand
    storage (full_unet.py:163-181 keeps no act_dtype knob of its own).

    Same function as the flax module up to operand rounding: convs run on
    ``act_dtype`` operands, the global sum pool accumulates in f32
    (``dtype=jnp.float32`` — the mini critic's f32-pool rule,
    models/critic.py:48), and the final Dense runs in f32. Built for the
    full-scale training-throughput grid (scripts/bench_full_train.py
    ``*_bf16act_critic`` rows): at n_critic 5 the critic dominates the
    GAN step, so generator-side storage wins dilute without this.
    Stability at bf16 is NOT established for the WGAN-GP equilibrium at
    full scale — roofline rows only, like ``gan_bf16``."""

    def apply(params: Any, candidate: jnp.ndarray,
              condition: jnp.ndarray) -> jnp.ndarray:
        p = params.get("params", params)
        h = jnp.concatenate([candidate, condition], axis=-1).astype(act_dtype)
        for i in range(levels):
            l = p[f"conv{i+1}"]
            h = leaky_relu(
                _conv(h, l["kernel"].astype(act_dtype),
                      l["bias"].astype(act_dtype), stride=2), leaky_slope)
        pooled = jnp.sum(h, axis=-2, dtype=jnp.float32)
        d = p["dense"]
        return pooled @ d["kernel"].astype(jnp.float32) \
            + d["bias"].astype(jnp.float32)

    return apply


def make_unet_infer_apply(levels: int = 5,
                          leaky_slope: float = 0.2,
                          act_dtype: Any = jnp.bfloat16,
                          fused_decoder: bool = True) -> Callable:
    """Return ``apply(params, x) -> y`` for serving.

    * ``params``: the standard FullUNetGenerator tree ({"params": {...}}
      or the bare {...} layer dict) — f32 trees are cast to ``act_dtype``
      inside the apply (so the same tree trains under this forward:
      train.py --fused_decoder), pre-cast serving trees pass through.
    * ``act_dtype``: activation storage dtype (bfloat16 serving default;
      float32 reproduces the training forward bit-for-bit when
      ``fused_decoder=False``).
    * ``fused_decoder=False`` falls back to the materialized
      upsample+conv(k=3) pipeline for A/B testing.
    """
    from ..ops.dense_conv import upsample_nearest_2x

    def apply(params: Any, x: jnp.ndarray) -> jnp.ndarray:
        p = params.get("params", params)

        def wb(name):
            # cast here (a no-op for pre-cast serving params) so the SAME
            # f32 param tree that trains under full_unet.py trains under
            # this forward too — bf16 act storage then runs true bf16
            # convs with f32 cotangent accumulation through the astype,
            # the same weights-f32/operands-rounded discipline as the
            # mini's flat bf16 path (models/flat.py:_mm)
            k, b = p[name]["kernel"], p[name]["bias"]
            return k.astype(act_dtype), b.astype(act_dtype)

        a = leaky_slope
        h = x.astype(act_dtype)
        skips = []
        for i in range(levels):
            h = leaky_relu(_conv(h, *wb(f"enc{i+1}_1"), stride=2), a)
            h = leaky_relu(_conv(h, *wb(f"enc{i+1}_2")), a)
            skips.append(h)

        h = leaky_relu(_conv(h, *wb("bottle1")), a)
        h = leaky_relu(_conv(h, *wb("bottle2")), a)

        for i in range(levels):
            k, b = wb(f"dec{i+1}_1")
            if fused_decoder:
                h = leaky_relu(_upconv_fused(h, k, b), a)
            else:
                h = leaky_relu(_conv(upsample_nearest_2x(h), k, b), a)
            h = leaky_relu(_conv(h, *wb(f"dec{i+1}_2")), a)
            if i < levels - 1:
                h = h + skips[levels - 2 - i]

        out = _conv(h, *wb("final"))
        return jnp.tanh(out)

    return apply
