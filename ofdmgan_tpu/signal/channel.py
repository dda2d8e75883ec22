"""Wireless channel models — AWGN, flat Rayleigh, Rician, tapped multipath.

Behavioral parity target: reference utils/ofdm_utils.py:612-832
(ChannelModel). Same conventions:
  * AWGN: noise power = mean|x|² / 10^(SNR/10), per-dimension σ = sqrt(P_n/2),
    measured on the signal *as received at the channel input* (so fading is
    applied first and the SNR is post-fading, like the reference).
  * Rayleigh: single scalar tap h ~ CN(0,1) per frame.
  * Rician: h = sqrt(K/(K+1))·e^{jθ} + sqrt(1/(K+1))·CN(0,1), θ ~ U(0,2π).
  * Multipath: per-tap Rayleigh CIR with normalized powers, "same"-mode
    convolution.

Every function takes an explicit PRNG key and operates on complex frames with
a trailing sample axis; all are jit/vmap-safe with static channel selection.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    kind: str = "awgn"  # "awgn" | "rayleigh" | "rician" | "multipath" | "none"
    k_factor: float = 3.0
    delays: Tuple[int, ...] = (0, 1, 2)
    powers: Tuple[float, ...] = (1.0, 0.5, 0.25)


def awgn(key: jax.Array, x: jnp.ndarray, snr_db: jnp.ndarray):
    """y = x + n with n ~ CN(0, σ²), σ² = P_sig/10^(SNR/10)
    (ofdm_utils.py:675-708). ``snr_db`` may be a scalar or broadcastable to
    the frame-batch shape ``x.shape[:-1]``."""
    power = jnp.mean(jnp.abs(x) ** 2, axis=-1, keepdims=True)
    snr = jnp.asarray(snr_db, jnp.float32)
    noise_power = power / (10.0 ** (snr[..., None] / 10.0))
    std = jnp.sqrt(noise_power / 2.0)
    kr, ki = jax.random.split(key)
    noise = std * (
        jax.random.normal(kr, x.shape, jnp.float32)
        + 1j * jax.random.normal(ki, x.shape, jnp.float32)
    )
    return x + noise, {"noise_power": noise_power[..., 0]}


def _cn01(key: jax.Array, shape=()):
    """Standard complex normal CN(0,1): (randn + j randn)/sqrt(2)."""
    kr, ki = jax.random.split(key)
    return (
        jax.random.normal(kr, shape, jnp.float32)
        + 1j * jax.random.normal(ki, shape, jnp.float32)
    ) / jnp.sqrt(2.0)


def rayleigh(key: jax.Array, x: jnp.ndarray, snr_db: jnp.ndarray):
    """Flat Rayleigh fading: one scalar tap per frame, then AWGN on the faded
    signal (ofdm_utils.py:710-740)."""
    kh, kn = jax.random.split(key)
    h = _cn01(kh, x.shape[:-1])
    faded = h[..., None] * x
    y, info = awgn(kn, faded, snr_db)
    info["h"] = h
    return y, info


def rician(key: jax.Array, x: jnp.ndarray, snr_db: jnp.ndarray, k_factor: float = 3.0):
    """Rician fading: LOS tap with random phase plus scattered CN component
    (ofdm_utils.py:742-786)."""
    kth, kh, kn = jax.random.split(key, 3)
    theta = jax.random.uniform(kth, x.shape[:-1], jnp.float32, 0.0, 2.0 * jnp.pi)
    h_los = jnp.sqrt(k_factor / (k_factor + 1.0)) * jnp.exp(1j * theta)
    h_nlos = jnp.sqrt(1.0 / (k_factor + 1.0)) * _cn01(kh, x.shape[:-1])
    h = h_los + h_nlos
    y, info = awgn(kn, h[..., None] * x, snr_db)
    info["h"] = h
    return y, info


def multipath(
    key: jax.Array,
    x: jnp.ndarray,
    snr_db: jnp.ndarray,
    delays: Tuple[int, ...] = (0, 1, 2),
    powers: Tuple[float, ...] = (1.0, 0.5, 0.25),
):
    """Tapped-delay-line channel with per-tap Rayleigh fading and
    "same"-mode convolution (ofdm_utils.py:788-832)."""
    kh, kn = jax.random.split(key)
    p = jnp.asarray(powers, jnp.float32)
    p = p / jnp.sum(p)
    max_delay = max(delays)
    taps = _cn01(kh, x.shape[:-1] + (len(delays),)) * jnp.sqrt(p)
    h = jnp.zeros(x.shape[:-1] + (max_delay + 1,), jnp.complex64)
    h = h.at[..., jnp.asarray(delays)].set(taps)

    # "same"-mode convolution, batched over leading axes.
    def conv_same(sig, cir):
        return jnp.convolve(sig, cir, mode="same")

    for _ in range(x.ndim - 1):
        conv_same = jax.vmap(conv_same)
    faded = conv_same(x, h)
    y, info = awgn(kn, faded, snr_db)
    info["h"] = h
    return y, info


def apply(key: jax.Array, x: jnp.ndarray, snr_db: jnp.ndarray, cfg: ChannelConfig):
    """Static dispatch over channel kinds (ofdm_utils.py:639-673)."""
    if cfg.kind == "awgn":
        return awgn(key, x, snr_db)
    if cfg.kind == "rayleigh":
        return rayleigh(key, x, snr_db)
    if cfg.kind == "rician":
        return rician(key, x, snr_db, cfg.k_factor)
    if cfg.kind == "multipath":
        return multipath(key, x, snr_db, cfg.delays, cfg.powers)
    if cfg.kind == "none":
        return x, {}
    raise ValueError(f"Unknown channel kind: {cfg.kind}")
