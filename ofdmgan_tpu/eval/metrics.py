"""Signal-quality metrics: MSE, EVM, SNR improvement, BER, PSNR/SSIM/NMSE.

Behavioral parity targets: benchmark_comparison.py:137-146 (MSE/EVM),
classical_equalizers.py:118-125 (SNR improvement), proof/verification.py:369-384
(before/after MSE), image_ofdm_visualization.py:74-136 (PSNR/SSIM/NMSE).
All jnp, batch-friendly (reduction over all but leading axes by default).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axes(x, per_item: bool):
    return tuple(range(1, x.ndim)) if per_item else None


def mse(est: jnp.ndarray, ref: jnp.ndarray, per_item: bool = False) -> jnp.ndarray:
    return jnp.mean(jnp.abs(est - ref) ** 2, axis=_axes(est, per_item))


def mse_db(est: jnp.ndarray, ref: jnp.ndarray, per_item: bool = False) -> jnp.ndarray:
    return 10.0 * jnp.log10(mse(est, ref, per_item) + 1e-10)


def evm_db(est: jnp.ndarray, ref: jnp.ndarray, per_item: bool = False) -> jnp.ndarray:
    """20·log10( sqrt( E|err|² / E|ref|² ) ) (benchmark_comparison.py:142-146)."""
    ax = _axes(est, per_item)
    e = jnp.sqrt(jnp.mean(jnp.abs(est - ref) ** 2, axis=ax)
                 / jnp.mean(jnp.abs(ref) ** 2, axis=ax))
    return 20.0 * jnp.log10(e + 1e-10)


def evm_percent(est: jnp.ndarray, ref: jnp.ndarray, per_item: bool = False) -> jnp.ndarray:
    ax = _axes(est, per_item)
    return 100.0 * jnp.sqrt(jnp.mean(jnp.abs(est - ref) ** 2, axis=ax)
                            / jnp.mean(jnp.abs(ref) ** 2, axis=ax))


def snr_improvement_db(noisy, est, ref, per_item: bool = False) -> jnp.ndarray:
    """10·log10(P_noisy / MSE(est)) (classical_equalizers.py:122-125)."""
    ax = _axes(est, per_item)
    return 10.0 * jnp.log10(
        jnp.mean(noisy**2, axis=ax) / (mse(est, ref, per_item) + 1e-10)
    )


def ber(bits_est: jnp.ndarray, bits_ref: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((bits_est != bits_ref).astype(jnp.float32))


def psnr(est: jnp.ndarray, ref: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """Peak SNR for the image path (image_ofdm_visualization.py:74-90)."""
    m = jnp.mean((est.astype(jnp.float32) - ref.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / (m + 1e-10))


def nmse(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(est - ref) ** 2) / (jnp.sum(jnp.abs(ref) ** 2) + 1e-10)


def ssim_global(est: jnp.ndarray, ref: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """Global (single-window) SSIM, as the reference computes it
    (image_ofdm_visualization.py:93-123)."""
    x = est.astype(jnp.float32)
    y = ref.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mx, my = jnp.mean(x), jnp.mean(y)
    vx, vy = jnp.var(x), jnp.var(y)
    cov = jnp.mean((x - mx) * (y - my))
    return ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx**2 + my**2 + c1) * (vx + vy + c2)
    )
