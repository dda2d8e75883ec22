"""Quantization-aware training: straight-through-estimator fake quantization.

Behavioral parity target: reference utils/quantization.py:164-256
(FakeQuantize, QuantizedConv1d): quantize->dequantize in the forward pass,
identity gradient (STE), running-max EMA statistics for activations,
per-channel scales for weights. Rebuilt as pure functions + a flax module
(state lives in a flax variable collection instead of torch buffers).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .qformat import compute_scale, dequantize, quantize


def fake_quantize(x: jnp.ndarray, scale, n_bits: int) -> jnp.ndarray:
    """STE fake-quant: forward = dequant(quant(x)), backward = identity
    (utils/quantization.py:192-205)."""
    q = dequantize(quantize(x, scale, n_bits), scale)
    return x + jax.lax.stop_gradient(q - x)


def fake_quantize_auto(
    x: jnp.ndarray, n_bits: int, per_channel: bool = False, channel_axis: int = 0
) -> jnp.ndarray:
    """Fake-quant with the scale computed from the tensor itself (the weight
    path: scale recomputed every step)."""
    scale = jax.lax.stop_gradient(compute_scale(x, n_bits, per_channel, channel_axis))
    return fake_quantize(x, scale, n_bits)


class FakeQuantize(nn.Module):
    """Stateful activation fake-quantizer with running-max EMA
    (utils/quantization.py:176-205). State lives in the ``batch_stats``
    collection; pass ``mutable=["batch_stats"]`` while training."""

    n_bits: int = 16
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        running_max = self.variable(
            "batch_stats", "running_max", lambda: jnp.zeros((), jnp.float32)
        )
        max_q = 2 ** (self.n_bits - 1) - 1
        if train:
            cur = jnp.max(jnp.abs(x))
            new_max = (1 - self.momentum) * running_max.value + self.momentum * cur
            if not self.is_initializing():
                running_max.value = new_max
            scale = jnp.maximum(cur, 1e-8) / max_q
        else:
            scale = jnp.maximum(running_max.value, 1e-8) / max_q
        return fake_quantize(x, jax.lax.stop_gradient(scale), self.n_bits)


class QuantizedConv1d(nn.Module):
    """QAT conv: INT8-faked weights, INT16-faked activations
    (utils/quantization.py:208-256). Channels-last [B, L, C]."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    weight_bits: int = 8
    activation_bits: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = FakeQuantize(n_bits=self.activation_bits, name="act_q")(x, train)
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        # per-out-channel scale: flax kernel layout [k, in, out] -> axis -1
        w_q = fake_quantize_auto(w, self.weight_bits, per_channel=True, channel_axis=2)
        from ..ops.dense_conv import conv1d_via_matmul

        return conv1d_via_matmul(x, w_q, b, self.stride, self.padding)
