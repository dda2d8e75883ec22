"""BER evaluation of signal enhancers — the bit-level fidelity metric.

Two protocols (both batched/jitted):

1. ``ber_time_domain``: QPSK-like ±a time-domain frames + AWGN (the
   reference's reconstruction-proof stimulus, proof/verification.py:352-360),
   per-sample hard sign decisions -> BER vs SNR.

2. ``ber_ofdm``: proper QPSK-on-subcarriers OFDM frames: bits -> QPSK ->
   L-bin IFFT frame (·sqrt(L), the training-frame transform) -> channel ->
   enhancer -> FFT -> hard QPSK demod -> BER. This measures end-to-end
   communication fidelity through the enhancer.

Used by compare_with_reference.py for the "BER within 0.1 dB of the
reference" parity check (BASELINE.md): the SNR offset between two BER
curves at matched BER.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..signal import qam
from ..utils.iq import complex_to_iq, iq_to_complex, joint_max_normalize


@partial(jax.jit, static_argnames=("n_frames", "frame_length", "gen_apply"))
def _ber_time_domain_one(key, params, snr_db, n_frames, frame_length, gen_apply, amplitude=0.7):
    k_bits, k_noise = jax.random.split(key)
    signs = jax.random.bernoulli(k_bits, 0.5, (n_frames, frame_length, 2))
    clean = jnp.where(signs, amplitude, -amplitude).astype(jnp.float32)
    noise_power = jnp.mean(clean**2) / (10.0 ** (snr_db / 10.0))
    noisy = clean + jnp.sqrt(noise_power) * jax.random.normal(k_noise, clean.shape)
    est = gen_apply(params, noisy) if gen_apply is not None else noisy
    errs = jnp.mean((est > 0) != signs)
    return errs


def ber_time_domain(gen_apply, params, snr_values, n_frames=2048, frame_length=16, seed=0):
    return {
        float(s): float(
            _ber_time_domain_one(
                jax.random.fold_in(jax.random.PRNGKey(seed), i), params,
                jnp.float32(s), n_frames, frame_length, gen_apply,
            )
        )
        for i, s in enumerate(snr_values)
    }


@partial(jax.jit, static_argnames=("n_frames", "frame_length", "gen_apply"))
def _ber_ofdm_one(key, params, snr_db, n_frames, frame_length, gen_apply):
    k_bits, k_noise = jax.random.split(key)
    n_bits = frame_length * 2  # QPSK on every bin
    bits = jax.random.bernoulli(k_bits, 0.5, (n_frames, n_bits)).astype(jnp.int32)
    syms = qam.modulate(bits, "QPSK")                    # [n, L]
    clean_c = jnp.fft.ifft(syms, axis=-1) * jnp.sqrt(float(frame_length))
    power = jnp.mean(jnp.abs(clean_c) ** 2, axis=-1, keepdims=True)
    noise_power = power / (10.0 ** (snr_db / 10.0))
    kr, ki = jax.random.split(k_noise)
    noise = jnp.sqrt(noise_power / 2.0) * (
        jax.random.normal(kr, clean_c.shape) + 1j * jax.random.normal(ki, clean_c.shape)
    )
    noisy_c = clean_c + noise

    clean_iq = complex_to_iq(clean_c).astype(jnp.float32)
    noisy_iq = complex_to_iq(noisy_c).astype(jnp.float32)
    noisy_n, clean_n = joint_max_normalize(noisy_iq, clean_iq)
    scale = noisy_iq[:, :1, :1] / jnp.where(noisy_n[:, :1, :1] == 0, 1.0, noisy_n[:, :1, :1])

    if gen_apply is not None:
        est = gen_apply(params, noisy_n)
    else:
        est = noisy_n
    # undo normalization so the demodulator sees physical amplitudes
    max_ = jnp.max(
        jnp.maximum(jnp.abs(noisy_iq), jnp.abs(clean_iq)), axis=(1, 2), keepdims=True
    )
    est_c = iq_to_complex(est * max_)
    rx_syms = jnp.fft.fft(est_c, axis=-1) / jnp.sqrt(float(frame_length))
    rx_bits = qam.demodulate(rx_syms, "QPSK")
    return jnp.mean((rx_bits != bits).astype(jnp.float32))


def ber_ofdm(gen_apply, params, snr_values, n_frames=2048, frame_length=16, seed=0):
    return {
        float(s): float(
            _ber_ofdm_one(
                jax.random.fold_in(jax.random.PRNGKey(seed), 1000 + i), params,
                jnp.float32(s), n_frames, frame_length, gen_apply,
            )
        )
        for i, s in enumerate(snr_values)
    }


def ber_curve_snr_offset(curve_a: Dict[float, float], curve_b: Dict[float, float],
                         target_ber: float = 1e-2) -> Optional[float]:
    """SNR offset (dB) between two BER curves at ``target_ber``:
    positive -> curve_a needs more SNR than curve_b (a is worse)."""

    def snr_at(curve):
        snrs = sorted(curve)
        bers = [max(curve[s], 1e-12) for s in snrs]
        lb = np.log10(bers)
        t = np.log10(target_ber)
        for i in range(len(snrs) - 1):
            if (lb[i] - t) * (lb[i + 1] - t) <= 0 and lb[i] != lb[i + 1]:
                f = (t - lb[i]) / (lb[i + 1] - lb[i])
                return snrs[i] + f * (snrs[i + 1] - snrs[i])
        return None

    a, b = snr_at(curve_a), snr_at(curve_b)
    if a is None or b is None:
        return None
    return a - b
