"""Fused on-device synthetic OFDM training-data generation.

Behavioral parity target: reference utils/dataset.py:185-293
(SyntheticOFDMDataset.__getitem__) — but generated as a whole batch in one
fused, jittable computation on the accelerator instead of one numpy frame at
a time on the host. Per frame:

  1. freq symbols  s ~ CN(0, 1) per bin:  (randn + j·randn)/sqrt(2)
  2. clean         = ifft(s) · sqrt(L)           (unit-power OFDM-like frame)
  3. distorted     = nonlinear impairments(clean)   [optional]
  4. snr           ~ U(snr_min, snr_max)            per frame
  5. noisy         = channel(distorted, snr)        (AWGN/Rayleigh/Rician/…)
  6. (noisy, clean) jointly max-abs normalized to [-1, 1]

Note the reference quirk kept on purpose (SURVEY.md §7.4): the *clean* target
is the pre-impairment signal, so with ``nonlinear=True`` the generator learns
to invert PA/IQ/PN distortion, not just denoise.

Returns channels-last I/Q ``[B, L, 2]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import channel as channel_lib
from . import impairments as imp_lib
from .ofdm import ofdm_like_frame
from ..utils.iq import complex_to_iq, joint_max_normalize


@dataclasses.dataclass(frozen=True)
class DatagenConfig:
    frame_length: int = 16
    snr_min: float = 0.0
    snr_max: float = 30.0
    channel: channel_lib.ChannelConfig = channel_lib.ChannelConfig("awgn")
    nonlinear: bool = False
    impairments: imp_lib.ImpairmentConfig = imp_lib.ImpairmentConfig()

    @staticmethod
    def make(
        frame_length: int = 16,
        snr_range=(0.0, 30.0),
        channel_type: str = "awgn",
        nonlinear: bool = False,
        pa_saturation: float = 1.0,
        iq_imbalance_db: float = 1.0,
        iq_phase_deg: float = 5.0,
        phase_noise_dbchz: float = -80.0,
    ) -> "DatagenConfig":
        """Constructor mirroring SyntheticOFDMDataset's signature
        (utils/dataset.py:195-231)."""
        return DatagenConfig(
            frame_length=frame_length,
            snr_min=float(snr_range[0]),
            snr_max=float(snr_range[1]),
            channel=channel_lib.ChannelConfig(channel_type),
            nonlinear=nonlinear,
            impairments=imp_lib.ImpairmentConfig(
                pa_saturation=pa_saturation,
                iq_amplitude_db=iq_imbalance_db,
                iq_phase_deg=iq_phase_deg,
                phase_noise_dbchz=phase_noise_dbchz,
            ),
        )


def synthetic_batch(key: jax.Array, batch_size: int, cfg: DatagenConfig):
    """Generate a batch of (noisy, clean, snr) training frames on device.

    Returns a dict with ``noisy``/``clean`` of shape ``[B, L, 2]`` (float32)
    and ``snr`` of shape ``[B]``.
    """
    l = cfg.frame_length
    k_sym, k_imp, k_snr, k_ch = jax.random.split(key, 4)

    kr, ki = jax.random.split(k_sym)
    freq = (
        jax.random.normal(kr, (batch_size, l), jnp.float32)
        + 1j * jax.random.normal(ki, (batch_size, l), jnp.float32)
    ) / jnp.sqrt(2.0)
    clean = ofdm_like_frame(freq)

    distorted = clean
    if cfg.nonlinear:
        distorted = imp_lib.apply_all(k_imp, clean, cfg.impairments)

    snr = jax.random.uniform(
        k_snr, (batch_size,), jnp.float32, cfg.snr_min, cfg.snr_max
    )
    noisy, _ = channel_lib.apply(k_ch, distorted, snr, cfg.channel)

    noisy_iq = complex_to_iq(noisy).astype(jnp.float32)
    clean_iq = complex_to_iq(clean).astype(jnp.float32)
    noisy_iq, clean_iq = joint_max_normalize(noisy_iq, clean_iq)
    return {"noisy": noisy_iq, "clean": clean_iq, "snr": snr}


def test_batch_at_snr(key: jax.Array, batch_size: int, snr_db: float, cfg: DatagenConfig):
    """Fixed-SNR evaluation batch (reference utils/dataset.py:326-383,
    generate_test_samples): same pipeline, constant SNR, no impairments
    unless enabled in ``cfg``."""
    fixed = dataclasses.replace(cfg, snr_min=float(snr_db), snr_max=float(snr_db))
    out = synthetic_batch(key, batch_size, fixed)
    out["snr"] = jnp.full((batch_size,), float(snr_db), jnp.float32)
    return out
