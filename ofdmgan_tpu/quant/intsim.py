"""Bit-true Q1.7/Q8.8 integer inference — the RTL datapath as JAX int32 ops.

This is the TPU-native equivalent of the reference's Verilog fixed-point
engines (rtl/ofdmGAN/generator_mini.v, discriminator_mini.v): every
arithmetic quirk of the hardware is reproduced exactly so quantized
inference can be validated without an FPGA or an iverilog run.

RTL semantics implemented (mode="rtl"):
  * Q8.8 int16 activations, Q1.7 int8 weights, int32 accumulators.
  * Per-tap requantize: each product is arithmetic-shifted ``>>> 7``
    BEFORE accumulation (generator_mini.v:141-146) — not ``(acc+64)>>7``
    after, which is what docs/math_foundation.py:291-292 documents; the two
    differ and the hardware does the former.
  * Bias (Q8.8, sign-extended) added once per output element, then the sum
    saturates to int16 (generator_mini.v:353-358).
  * LeakyReLU on the *saturated* value: ``x<0 -> (x>>>2)+(x>>>4)``
    i.e. slope 0.3125, not the float model's 0.2 (generator_mini.v:359-361).
  * Output conv uses ONLY the center tap (k=1) with its own weight layout
    (generator_mini.v:73,576-625), unlike the float model's k=3.
  * tanh = clamp: ``>0x0100 -> 0x00FF``, ``<-0x0100 -> 0xFF01``
    (generator_mini.v:630-648). Values of exactly ±256 pass through.
  * Additive skip with int16 saturation (generator_mini.v:530-555).
  * Discriminator: same conv pipeline; global sum pool accumulates int16
    outputs into int32 (discriminator_mini.v:428-445); the dense layer reads
    only the LOW 16 BITS of each pooled accumulator
    (discriminator_mini.v:454 ``pool_buf[out_ch_cnt][15:0]``) — faithfully
    reproduced, overflow truncation included; final score saturates to int16.

mode="float_ref" replaces the RTL idiosyncrasies with the float model's
semantics quantized at each step (slope 0.2 via rounding, k=3 out conv,
real tanh in Q8.8, round-half-away requantize after accumulation) — useful
for measuring what the RTL's approximations cost.

All functions are jittable/vmappable; weights come from
``quantize_weights_rtl`` (true Q1.7/Q8.8: round(w*128)/round(b*256)).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

I16_MAX, I16_MIN = 32767, -32768


def _sat16(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, I16_MIN, I16_MAX)


def _sra(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Arithmetic shift right (Verilog >>>): floor division by 2^n."""
    return x >> n


class IntLayer(NamedTuple):
    weight: np.ndarray  # int [out, in, k] (Q1.7) or [out, in] for dense
    bias: np.ndarray    # int [out] (Q8.8)


class IntGenParams(NamedTuple):
    enc1: IntLayer
    bottleneck: IntLayer
    dec1: IntLayer
    out_conv: IntLayer  # RTL mode uses only k=1 center tap


class IntDiscParams(NamedTuple):
    conv1: IntLayer
    conv2: IntLayer
    dense: IntLayer


def quantize_weights_rtl(params, model: str = "generator"):
    """Float flax params -> true Q1.7 weights / Q8.8 biases (int arrays).

    This is the quantization the RTL ROM actually implements (Q-format,
    docs/math_foundation.py:261-292) as opposed to the per-channel-scale
    int8 export (utils/quantization.py) whose ints are NOT Q1.7.
    """
    from .export import discriminator_layers, generator_layers

    layers = generator_layers(params) if model == "generator" else discriminator_layers(params)

    def q(l):
        w = np.clip(np.round(l.weight * 128.0), -128, 127).astype(np.int32)
        b = np.clip(np.round(l.bias * 256.0), I16_MIN, I16_MAX).astype(np.int32)
        return IntLayer(w, b)

    if model == "generator":
        return IntGenParams(*(q(l) for l in layers))
    return IntDiscParams(*(q(l) for l in layers))


def float_to_q88(x: jnp.ndarray) -> jnp.ndarray:
    """Float -> Q8.8 int32, truncating toward zero (the golden-vector and
    testbench input convention, proof/verification.py:297)."""
    return _sat16(jnp.trunc(x * 256.0)).astype(jnp.int32)


def q88_to_float(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32) / 256.0


def _conv1d_int(
    x: jnp.ndarray,           # int32 [B, L, Cin] Q8.8
    layer: IntLayer,
    stride: int,
    mode: str,
) -> jnp.ndarray:
    """Strided k=3 p=1 integer conv with per-tap (rtl) or post-accumulation
    (float_ref) requantization. Returns UNsaturated int32 pre-activation."""
    w = jnp.asarray(layer.weight)          # [out, in, k]
    b = jnp.asarray(layer.bias)            # [out]
    bsz, l_in, cin = x.shape
    cout, _, k = w.shape
    l_out = (l_in + 2 - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    # windows: [B, l_out, k, cin]
    starts = jnp.arange(l_out) * stride
    win = xp[:, starts[:, None] + jnp.arange(k)[None, :], :]
    if mode == "rtl":
        # per-tap >>>7 BEFORE summing anything (generator_mini.v:146)
        prod = win[..., None] * w.transpose(2, 1, 0)[None, None, :, :, :]  # [B,L,k,cin,cout]
        acc = jnp.sum(_sra(prod, 7), axis=(2, 3))
    else:
        prod = win[..., None] * w.transpose(2, 1, 0)[None, None, :, :, :]
        acc = jnp.sum(prod, axis=(2, 3))
        acc = _sra(acc + 64, 7)  # round-to-nearest requantize (math_foundation.py:291)
    return acc + b[None, None, :]


def _lrelu_int(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """x is saturated int16-range int32. RTL: (x>>>2)+(x>>>4) for negatives
    (slope 0.3125, generator_mini.v:359-361); float_ref: round(0.2*x)."""
    if mode == "rtl":
        neg = _sra(x, 2) + _sra(x, 4)
    else:
        neg = jnp.sign(x) * ((jnp.abs(x) * 51 + 128) >> 8)  # ~0.19921875·x rounded
    return jnp.where(x < 0, neg, x)


def _upsample2_int(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(x, 2, axis=-2)


def generator_int_forward(
    iparams: IntGenParams, x_q88: jnp.ndarray, mode: str = "rtl"
) -> jnp.ndarray:
    """Integer mini U-Net forward: int32 Q8.8 in [B, L, 2] -> same shape.

    Mirrors the generator_mini.v FSM sequence ENC1 -> BNECK -> UPSAMPLE1 ->
    DEC1 -> SKIP_ADD -> UPSAMPLE2 -> OUT_CONV -> TANH.

    ``mode="rtl_residual"``: the RTL datapath (per-tap ``>>>7``, slope-0.3125
    LeakyReLU, center-tap output conv) with the final clamp-tanh replaced by
    a SATURATING INPUT ADD — ``out = sat16(conv + bias + x)`` — the hardware
    form of the input-residual head (one skip wire + adder in place of the
    clamp stage). This is the deployable variant of the architecture fix in
    results/RESULTS.md §Identity baselines; bit-exact against
    native/fixsim.cpp's residual entry point (tests/test_cosim.py).
    """
    residual = mode == "rtl_residual"
    if residual:
        mode = "rtl"
    x = x_q88.astype(jnp.int32)
    enc1 = _lrelu_int(_sat16(_conv1d_int(x, iparams.enc1, 2, mode)), mode)
    bneck = _lrelu_int(_sat16(_conv1d_int(enc1, iparams.bottleneck, 2, mode)), mode)
    up1 = _upsample2_int(bneck)
    dec1 = _lrelu_int(_sat16(_conv1d_int(up1, iparams.dec1, 1, mode)), mode)
    skip = _sat16(dec1 + enc1)
    up2 = _upsample2_int(skip)

    if mode == "rtl":
        # center-tap-only output conv (k=1): weight [2, 4, 3] -> take k=1
        w = jnp.asarray(iparams.out_conv.weight)
        w_center = w[:, :, w.shape[2] // 2] if w.ndim == 3 else w  # [out, in]
        b = jnp.asarray(iparams.out_conv.bias)
        prod = up2[..., None] * w_center.T[None, None, :, :]
        acc = jnp.sum(_sra(prod, 7), axis=2) + b[None, None, :]
        if residual:
            # saturating input add replaces the clamp-tanh stage
            out = _sat16(acc + x)
        else:
            out = _sat16(acc)
            # tanh-as-clamp (generator_mini.v:630-648): >256 -> 255, <-256 -> -255
            out = jnp.where(out > 256, 255, out)
            out = jnp.where(out < -256, -255, out)
    else:
        out = _sat16(_conv1d_int(up2, iparams.out_conv, 1, mode))
        out = float_to_q88(jnp.tanh(q88_to_float(out)))
    return out


def discriminator_int_forward(
    iparams: IntDiscParams,
    cand_q88: jnp.ndarray,
    cond_q88: jnp.ndarray,
    mode: str = "rtl",
) -> jnp.ndarray:
    """Integer critic forward: [B, L, 2] x2 -> int32 [B, 1] Q8.8 score.

    Mirrors discriminator_mini.v CONV1 -> CONV2 -> POOL -> DENSE -> saturate.
    """
    x = jnp.concatenate([cand_q88, cond_q88], axis=-1).astype(jnp.int32)
    h = _lrelu_int(_sat16(_conv1d_int(x, iparams.conv1, 2, mode)), mode)
    h = _lrelu_int(_sat16(_conv1d_int(h, iparams.conv2, 2, mode)), mode)
    pool = jnp.sum(h, axis=-2)  # int32 accumulator, [B, 16]
    if mode == "rtl":
        # hardware truncates the pooled accumulator to its low 16 bits
        # before the dense multiply (discriminator_mini.v:454)
        pool16 = ((pool + 32768) & 0xFFFF) - 32768
    else:
        pool16 = _sat16(pool)
    w = jnp.asarray(iparams.dense.weight)  # [1, 16]
    b = jnp.asarray(iparams.dense.bias)    # [1]
    prod = pool16[:, None, :] * w[None, :, :]
    if mode == "rtl":
        acc = jnp.sum(_sra(prod, 7), axis=-1) + b[None, :]
    else:
        acc = _sra(jnp.sum(prod, axis=-1) + 64, 7) + b[None, :]
    return _sat16(acc)


def int_outputs_to_float(out_q88: jnp.ndarray) -> jnp.ndarray:
    return q88_to_float(out_q88)


def quantization_error_report(params, x_float, mode: str = "rtl") -> Dict[str, float]:
    """Compare integer inference against the float model on a batch; returns
    MSE and max-abs error in float units — the rebuild's analog of the RTL
    testbench accuracy tables (tb_generator_mini.v:687-733)."""
    import jax

    from ..models import MiniGenerator

    gen = MiniGenerator()
    y_float = gen.apply(params, x_float)
    ip = quantize_weights_rtl(jax.device_get(params), "generator")
    y_int = int_outputs_to_float(generator_int_forward(ip, float_to_q88(x_float), mode))
    err = y_int - y_float
    return {
        "mse": float(jnp.mean(err**2)),
        "max_abs": float(jnp.max(jnp.abs(err))),
        "rms_float": float(jnp.sqrt(jnp.mean(y_float**2))),
    }
