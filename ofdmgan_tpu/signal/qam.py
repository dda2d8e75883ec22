"""QAM modulation/demodulation (QPSK, 16-QAM, 64-QAM) — vectorized JAX.

Behavioral parity target: reference utils/ofdm_utils.py:90-222 (QAMModulator).
Same constellation ordering (MSB-first bit-to-index map; meshgrid-flattened
PAM grid normalized to unit average power), same hard-decision min-distance
demodulation — rebuilt as pure, jittable array ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SCHEMES = ("QPSK", "QAM16", "QAM64")


def bits_per_symbol(modulation: str) -> int:
    mod = modulation.upper()
    if mod == "QPSK":
        return 2
    if mod == "QAM16":
        return 4
    if mod == "QAM64":
        return 6
    raise ValueError(f"Unsupported modulation: {modulation}")


def constellation(modulation: str) -> np.ndarray:
    """Constellation points indexed by the MSB-first integer of the bit group.

    QPSK: [1+1j, 1-1j, -1+1j, -1-1j]/sqrt(2)  (ofdm_utils.py:105-109).
    M-QAM: meshgrid of odd PAM levels, row-major flatten, normalized by
    sqrt(2(M-1)/3) (ofdm_utils.py:137-161).
    """
    mod = modulation.upper()
    if mod == "QPSK":
        return np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], dtype=np.complex64) / np.sqrt(2)
    b = bits_per_symbol(mod)
    m = 2**b
    sqrt_m = int(np.sqrt(m))
    levels = np.arange(-sqrt_m + 1, sqrt_m, 2)
    i_grid, q_grid = np.meshgrid(levels, levels)
    points = (i_grid + 1j * q_grid).flatten()
    norm = np.sqrt(2.0 * (m - 1) / 3.0)
    return (points / norm).astype(np.complex64)


def modulate(bits: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """Map a flat bit array ``[..., n_bits]`` to complex symbols.

    Bits are grouped MSB-first into indices (ofdm_utils.py:163-193). Trailing
    bits that do not fill a group are dropped, matching the reference.
    """
    b = bits_per_symbol(modulation)
    const = jnp.asarray(constellation(modulation))
    n_sym = bits.shape[-1] // b
    groups = bits[..., : n_sym * b].reshape(*bits.shape[:-1], n_sym, b).astype(jnp.int32)
    powers = jnp.asarray(2 ** np.arange(b - 1, -1, -1), dtype=jnp.int32)
    idx = jnp.sum(groups * powers, axis=-1)
    return const[idx]


def demodulate(symbols: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """Hard-decision demod: nearest constellation point, MSB-first bit unpack.

    Mirrors ofdm_utils.py:195-222 (argmin squared distance over the
    constellation, index -> bits).
    """
    b = bits_per_symbol(modulation)
    const = jnp.asarray(constellation(modulation))
    d2 = jnp.abs(symbols[..., None] - const) ** 2
    idx = jnp.argmin(d2, axis=-1)
    shifts = jnp.asarray(np.arange(b - 1, -1, -1), dtype=jnp.int32)
    bits = (idx[..., None] >> shifts) & 1
    return bits.reshape(*symbols.shape[:-1], symbols.shape[-1] * b)
