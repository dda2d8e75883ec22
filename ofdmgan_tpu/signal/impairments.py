"""Nonlinear RF front-end impairments — pure, key-driven JAX ops.

Behavioral parity target: reference utils/ofdm_utils.py:378-605
(NonLinearImpairments). Same models and parameter conventions:
  * Rapp PA AM/AM:   G(a) = 1 / (1 + (a/A)^(2p))^(1/(2p))
  * Saleh PA:        A(r) = αa r/(1+βa r²),  Φ(r) = αp r²/(1+βp r²)
  * IQ imbalance:    I'=I,  Q' = g (cosφ·Q + sinφ·I),  g = 10^(dB/20)
  * Phase noise:     Wiener process θ[n] = θ[n-1] + w,  σ = sqrt(P_pn·fs)
  * DC offset:       x + sqrt(P_sig)(di + j·dq)
  * CFO:             x·exp(j 2π f n / fs)
  * apply_all order: PA -> IQ -> PN -> DC -> CFO

All functions are elementwise over a trailing sample axis and jit/vmap-safe;
randomness is explicit via PRNG keys (the reference uses global numpy RNG).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ImpairmentConfig:
    """Static impairment settings (defaults mirror NonLinearImpairments.apply_all)."""

    pa_enabled: bool = True
    pa_model: str = "rapp"          # "rapp" | "saleh"
    pa_saturation: float = 1.0
    pa_smoothness: float = 3.0
    iq_enabled: bool = True
    iq_amplitude_db: float = 1.0
    iq_phase_deg: float = 5.0
    phase_noise_enabled: bool = True
    phase_noise_dbchz: float = -80.0
    sample_rate: float = 1e6
    dc_enabled: bool = False
    dc_offset_i: float = 0.01
    dc_offset_q: float = 0.01
    cfo_enabled: bool = False
    cfo_hz: float = 100.0


def pa_rapp(x: jnp.ndarray, saturation: float = 1.0, smoothness: float = 3.0) -> jnp.ndarray:
    """Rapp solid-state PA AM/AM compression (ofdm_utils.py:393-421)."""
    amp = jnp.abs(x)
    ratio = amp / saturation
    gain = (1.0 + ratio ** (2.0 * smoothness)) ** (-1.0 / (2.0 * smoothness))
    # amp * gain * exp(j*angle) == x * gain (phase preserved)
    return x * gain


def pa_saleh(
    x: jnp.ndarray,
    alpha_a: float = 2.1587,
    beta_a: float = 1.1517,
    alpha_p: float = 4.0033,
    beta_p: float = 9.1040,
) -> jnp.ndarray:
    """Saleh TWT PA AM/AM + AM/PM (ofdm_utils.py:423-455)."""
    r = jnp.abs(x)
    r2 = r * r
    a_out = alpha_a * r / (1.0 + beta_a * r2)
    phi = alpha_p * r2 / (1.0 + beta_p * r2)
    return a_out * jnp.exp(1j * (jnp.angle(x) + phi))


def iq_imbalance(x: jnp.ndarray, amplitude_db: float = 1.0, phase_deg: float = 5.0) -> jnp.ndarray:
    """Amplitude/phase mismatch between I and Q branches (ofdm_utils.py:457-488)."""
    g = 10.0 ** (amplitude_db / 20.0)
    phi = jnp.deg2rad(phase_deg)
    i = jnp.real(x)
    q = jnp.imag(x)
    q_out = g * (jnp.cos(phi) * q + jnp.sin(phi) * i)
    return i + 1j * q_out


def phase_noise(
    key: jax.Array,
    x: jnp.ndarray,
    power_dbchz: float = -80.0,
    sample_rate: float = 1e6,
) -> jnp.ndarray:
    """Wiener (random-walk) phase noise over the trailing axis
    (ofdm_utils.py:490-521). σ = sqrt(10^(dBc/10) · fs)."""
    sigma = jnp.sqrt(10.0 ** (power_dbchz / 10.0) * sample_rate)
    increments = sigma * jax.random.normal(key, x.shape, dtype=jnp.float32)
    theta = jnp.cumsum(increments, axis=-1)
    return x * jnp.exp(1j * theta)


def dc_offset(x: jnp.ndarray, offset_i: float = 0.01, offset_q: float = 0.01) -> jnp.ndarray:
    """Additive DC proportional to RMS amplitude (ofdm_utils.py:523-543).
    Power is averaged over the trailing axis (per frame)."""
    power = jnp.mean(jnp.abs(x) ** 2, axis=-1, keepdims=True)
    mag = jnp.sqrt(power)
    return x + mag * (offset_i + 1j * offset_q)


def cfo(x: jnp.ndarray, cfo_hz: float = 100.0, sample_rate: float = 1e6) -> jnp.ndarray:
    """Carrier frequency offset rotation (ofdm_utils.py:545-568)."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    return x * jnp.exp(1j * (2.0 * jnp.pi * cfo_hz / sample_rate) * n)


def apply_all(key: jax.Array, x: jnp.ndarray, cfg: ImpairmentConfig) -> jnp.ndarray:
    """Apply enabled impairments in the reference's fixed order
    (ofdm_utils.py:570-605): PA -> IQ imbalance -> phase noise -> DC -> CFO.

    ``cfg`` fields are Python statics, so disabled stages trace away to
    nothing under jit.
    """
    out = x
    if cfg.pa_enabled:
        if cfg.pa_model == "rapp":
            out = pa_rapp(out, cfg.pa_saturation, cfg.pa_smoothness)
        elif cfg.pa_model == "saleh":
            out = pa_saleh(out)
        else:
            raise ValueError(f"unknown pa_model {cfg.pa_model}")
    if cfg.iq_enabled:
        out = iq_imbalance(out, cfg.iq_amplitude_db, cfg.iq_phase_deg)
    if cfg.phase_noise_enabled:
        out = phase_noise(key, out, cfg.phase_noise_dbchz, cfg.sample_rate)
    if cfg.dc_enabled:
        out = dc_offset(out, cfg.dc_offset_i, cfg.dc_offset_q)
    if cfg.cfo_enabled:
        out = cfo(out, cfg.cfo_hz, cfg.sample_rate)
    return out
