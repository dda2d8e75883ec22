"""I/Q layout and complex<->real conversions.

Framework convention: channels-last ``[..., L, 2]`` with ``[..., 0]`` = I
(real) and ``[..., 1]`` = Q (imag). The reference uses ``[2, L]``
(reference utils/ofdm_utils.py:71-77); converters are provided for boundary
compatibility (golden vectors, exports, CLI output).
"""

from __future__ import annotations

import jax.numpy as jnp


def complex_to_iq(x: jnp.ndarray) -> jnp.ndarray:
    """Complex ``[..., L]`` -> real ``[..., L, 2]`` channels-last I/Q."""
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def iq_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Real ``[..., L, 2]`` -> complex ``[..., L]``."""
    return x[..., 0] + 1j * x[..., 1]


def nlc_to_ncl(x: jnp.ndarray) -> jnp.ndarray:
    """``[..., L, C]`` (framework) -> ``[..., C, L]`` (reference layout)."""
    return jnp.swapaxes(x, -1, -2)


def ncl_to_nlc(x: jnp.ndarray) -> jnp.ndarray:
    """``[..., C, L]`` (reference layout) -> ``[..., L, C]`` (framework)."""
    return jnp.swapaxes(x, -1, -2)


def joint_max_normalize(noisy: jnp.ndarray, clean: jnp.ndarray, eps: float = 1e-12):
    """Jointly max-abs normalize a (noisy, clean) pair to [-1, 1].

    Matches reference utils/dataset.py:284-287: one shared scale per frame,
    the max of |noisy| and |clean|. Reduction is over all axes except the
    leading batch axis.
    """
    axes = tuple(range(1, noisy.ndim))
    m = jnp.maximum(
        jnp.max(jnp.abs(noisy), axis=axes, keepdims=True),
        jnp.max(jnp.abs(clean), axis=axes, keepdims=True),
    )
    m = jnp.maximum(m, eps)
    return noisy / m, clean / m
