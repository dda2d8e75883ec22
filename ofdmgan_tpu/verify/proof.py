"""End-to-end OFDM reconstruction proof + fixed-point accuracy proof.

Behavioral parity target: reference proof/verification.py:331-384
(OFDMReconstructionProof): QPSK-like ±0.7 frames + AWGN at a given SNR ->
generator -> MSE before/after, SNR improvement in dB. Extended with the
int-datapath variant (the RTL-equivalent accuracy table,
tb_generator_mini.v:687-733 role).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def test_signal_enhancement(
    gen_apply,
    params_g,
    snr_db: float,
    n_samples: int = 100,
    frame_length: int = 16,
    key: jax.Array | None = None,
) -> Dict[str, float]:
    """Signal-enhancement proof at one SNR (proof/verification.py:343-384).
    Vectorized: all n_samples frames in one batch."""
    key = jax.random.PRNGKey(0) if key is None else key
    k_sig, k_noise = jax.random.split(key)
    signs = jax.random.bernoulli(k_sig, 0.5, (n_samples, frame_length, 2))
    clean = jnp.where(signs, 0.7, -0.7).astype(jnp.float32)
    signal_power = jnp.mean(clean**2)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    noisy = clean + jnp.sqrt(noise_power) * jax.random.normal(k_noise, clean.shape)

    enhanced = gen_apply(params_g, noisy)
    mse_before = jnp.mean((noisy - clean) ** 2)
    mse_after = jnp.mean((enhanced - clean) ** 2)
    return {
        "snr_input_db": float(snr_db),
        "mse_before": float(mse_before),
        "mse_after": float(mse_after),
        "snr_improvement_db": float(10.0 * jnp.log10(mse_before / (mse_after + 1e-10))),
    }


def test_int_datapath_enhancement(
    params_g, snr_db: float, n_samples: int = 100, frame_length: int = 16,
    mode: str = "rtl", key: jax.Array | None = None,
) -> Dict[str, float]:
    """Same proof through the Q1.7/Q8.8 integer datapath (quant/intsim.py) —
    quantifies what fixed-point inference costs at each SNR."""
    from ..quant import intsim

    key = jax.random.PRNGKey(0) if key is None else key
    k_sig, k_noise = jax.random.split(key)
    signs = jax.random.bernoulli(k_sig, 0.5, (n_samples, frame_length, 2))
    clean = jnp.where(signs, 0.7, -0.7).astype(jnp.float32)
    noise_power = jnp.mean(clean**2) / (10.0 ** (snr_db / 10.0))
    noisy = clean + jnp.sqrt(noise_power) * jax.random.normal(k_noise, clean.shape)

    ip = intsim.quantize_weights_rtl(jax.device_get(params_g), "generator")
    y = intsim.generator_int_forward(ip, intsim.float_to_q88(noisy), mode)
    enhanced = intsim.q88_to_float(y)
    mse_before = jnp.mean((noisy - clean) ** 2)
    mse_after = jnp.mean((enhanced - clean) ** 2)
    return {
        "snr_input_db": float(snr_db),
        "mode": mode,
        "mse_before": float(mse_before),
        "mse_after": float(mse_after),
        "snr_improvement_db": float(10.0 * jnp.log10(mse_before / (mse_after + 1e-10))),
    }
