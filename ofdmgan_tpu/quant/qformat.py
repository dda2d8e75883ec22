"""Fixed-point Q-format and symmetric-scale quantization primitives.

Behavioral parity targets:
  * scale/quantize/dequantize math: reference utils/quantization.py:73-161
    (scale = clamp(max|x|, 1e-8)/(2^(n-1)-1); round + clamp).
  * Q-format conventions: Q1.7 weights (x·2^7), Q8.8 activations (x·2^8),
    Q16.16 accumulators (docs/math_foundation.py:261-292).
  * Golden-vector encoding: value·256 truncated **toward zero** to int16
    (proof/verification.py:297-312 uses numpy astype, which truncates).

All pure jnp/numpy, usable inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

Q17_FRAC = 7    # weights: 1 sign + 7 frac bits (int8)
Q88_FRAC = 8    # activations: 8 int + 8 frac bits (int16)
Q1616_FRAC = 16  # accumulators (int32)


def compute_scale(x: jnp.ndarray, n_bits: int, per_channel: bool = False, channel_axis: int = 0):
    """Symmetric quantization scale (utils/quantization.py:73-112)."""
    max_q = 2 ** (n_bits - 1) - 1
    if per_channel:
        axes = tuple(i for i in range(x.ndim) if i != channel_axis)
        abs_max = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    else:
        abs_max = jnp.max(jnp.abs(x))
    abs_max = jnp.maximum(abs_max, 1e-8)
    return abs_max / max_q


def quantize(x: jnp.ndarray, scale, n_bits: int) -> jnp.ndarray:
    """round(x/scale) clamped to the signed n-bit range; float dtype so
    gradients can flow (utils/quantization.py:115-141)."""
    hi = 2 ** (n_bits - 1) - 1
    lo = -(2 ** (n_bits - 1))
    return jnp.clip(jnp.round(x / scale), lo, hi)


def dequantize(q: jnp.ndarray, scale) -> jnp.ndarray:
    return q * scale


def float_to_fixed(x: jnp.ndarray, frac_bits: int, width: int, rounding: str = "round") -> jnp.ndarray:
    """Float -> signed fixed-point integer.

    rounding='round': round-to-nearest (weight/bias export path).
    rounding='trunc': truncate toward zero — the golden-vector convention
    (numpy float->int16 cast semantics, proof/verification.py:297).
    """
    scaled = x * (2**frac_bits)
    if rounding == "trunc":
        q = jnp.trunc(scaled)
    elif rounding == "round":
        q = jnp.round(scaled)
    else:
        raise ValueError(rounding)
    hi = 2 ** (width - 1) - 1
    lo = -(2 ** (width - 1))
    return jnp.clip(q, lo, hi).astype(jnp.int32)


def fixed_to_float(q: jnp.ndarray, frac_bits: int) -> jnp.ndarray:
    return q.astype(jnp.float32) / (2**frac_bits)


def to_hex16(v: int) -> str:
    """16-bit two's-complement uppercase hex, golden-vector file format
    (proof/verification.py:306-312)."""
    return f"{int(v) & 0xFFFF:04X}"


def to_hex8(v: int) -> str:
    return f"{int(v) & 0xFF:02X}"
