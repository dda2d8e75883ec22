"""OFDM frame codec: subcarrier mapping, IFFT/FFT, cyclic prefix, pilots.

Behavioral parity target: reference utils/ofdm_utils.py:229-371
(OFDMModulator). Same conventions:
  * pilots at ``arange(0, N, pilot_spacing)`` with a constant pilot value,
  * time symbols = ``ifft(freq) * N`` (i.e. an unnormalized inverse DFT),
  * cyclic prefix = last ``cp`` samples prepended,
  * demod: drop CP, ``fft(time) / N``, extract data + pilot-LS channel
    estimate ``H = rx_pilot / tx_pilot``.

Rebuilt as static-shape JAX ops. For small N the IFFT/FFT are also exposed
as real-valued DFT matmuls (``dft_matrices``) so the fused datagen path can
ride the MXU instead of the FFT lowering.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OFDMSpec:
    n_subcarriers: int = 64
    cp_length: int = 16
    pilot_spacing: int = 8
    pilot_value: complex = 1 + 0j

    @property
    def samples_per_symbol(self) -> int:
        return self.n_subcarriers + self.cp_length

    @property
    def pilot_indices(self) -> np.ndarray:
        return np.arange(0, self.n_subcarriers, self.pilot_spacing)

    @property
    def data_indices(self) -> np.ndarray:
        mask = np.ones(self.n_subcarriers, dtype=bool)
        mask[self.pilot_indices] = False
        return np.nonzero(mask)[0]

    @property
    def n_data_subcarriers(self) -> int:
        return int(self.data_indices.size)


@lru_cache(maxsize=None)
def dft_matrices(n: int):
    """(Wr, Wi) with W[t, k] = exp(+j 2π t k / n): unnormalized inverse-DFT
    basis so that ``ifft(x) * n == W @ x``. Returned as float32 numpy arrays,
    ready to be fed to the MXU as two real matmuls."""
    t = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    w = np.exp(2j * np.pi * t * k / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def modulate(qam_symbols: jnp.ndarray, spec: OFDMSpec) -> jnp.ndarray:
    """QAM symbols ``[..., S]`` -> flattened time-domain signal.

    Pads the symbol stream to a whole number of OFDM symbols with zeros,
    scatters data/pilots onto subcarriers, applies ``ifft * N`` and prepends
    the cyclic prefix (ofdm_utils.py:281-329).
    """
    n = spec.n_subcarriers
    nd = spec.n_data_subcarriers
    s = qam_symbols.shape[-1]
    n_sym = -(-s // nd)  # ceil
    pad = n_sym * nd - s
    padded = jnp.pad(qam_symbols, [(0, 0)] * (qam_symbols.ndim - 1) + [(0, pad)])
    data = padded.reshape(*qam_symbols.shape[:-1], n_sym, nd)

    freq = jnp.zeros((*qam_symbols.shape[:-1], n_sym, n), dtype=jnp.complex64)
    freq = freq.at[..., jnp.asarray(spec.data_indices)].set(data)
    freq = freq.at[..., jnp.asarray(spec.pilot_indices)].set(spec.pilot_value)

    time = jnp.fft.ifft(freq, axis=-1) * n
    with_cp = jnp.concatenate([time[..., -spec.cp_length:], time], axis=-1)
    return with_cp.reshape(*qam_symbols.shape[:-1], n_sym * spec.samples_per_symbol)


def demodulate(signal: jnp.ndarray, spec: OFDMSpec):
    """Time signal ``[..., T]`` -> (data symbols, per-symbol channel estimate).

    Drops trailing partial symbols, removes CP, ``fft / N``, and extracts the
    data subcarriers plus pilot-based LS channel estimates
    (ofdm_utils.py:331-371).
    """
    sps = spec.samples_per_symbol
    n_sym = signal.shape[-1] // sps
    frames = signal[..., : n_sym * sps].reshape(*signal.shape[:-1], n_sym, sps)
    time = frames[..., spec.cp_length:]
    freq = jnp.fft.fft(time, axis=-1) / spec.n_subcarriers
    data = freq[..., jnp.asarray(spec.data_indices)].reshape(*signal.shape[:-1], -1)
    pilots = freq[..., jnp.asarray(spec.pilot_indices)]
    h_est = pilots / spec.pilot_value
    return data, h_est


def ofdm_like_frame(freq_symbols: jnp.ndarray) -> jnp.ndarray:
    """``ifft(freq) * sqrt(L)`` — the synthetic-dataset clean-frame transform
    (reference utils/dataset.py:241-247): unit-power OFDM-like time signal
    from unit-power random frequency symbols."""
    n = freq_symbols.shape[-1]
    return jnp.fft.ifft(freq_symbols, axis=-1) * jnp.sqrt(jnp.asarray(n, jnp.float32))
