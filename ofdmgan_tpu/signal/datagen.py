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
import functools

import jax
import jax.numpy as jnp
import numpy as np

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


@functools.lru_cache(maxsize=None)
def _flat_dft_mats(l: int):
    """(Mr, Mi, Er, Ei): [L, 2L] f32 matrices mapping the raw normal draws to
    interleaved-I/Q flat frames.

    ``clean_flat = zr @ Mr + zi @ Mi`` equals ``complex_to_iq(ifft((zr+j·zi)/
    sqrt(2))·sqrt(L)).reshape(B, 2L)``; ``Er``/``Ei`` interleave the AWGN
    draws (``noise_flat = nr @ Er + ni @ Ei``). Everything rides the MXU —
    no FFT lowering, no complex<->I/Q relayout passes (the jit(fft) and
    iq.py fusions dominate the datagen slice of the device profile,
    results/profile_step_flat.json)."""
    t = np.arange(l)[:, None]
    k = np.arange(l)[None, :]
    c = np.exp(2j * np.pi * t * k / l)  # c[t, k] = e^{+j2pi t k / l}
    s = 1.0 / np.sqrt(2.0 * l)  # (1/L from ifft) * sqrt(L) / sqrt(2)
    mr = np.zeros((l, 2 * l), np.float32)
    mi = np.zeros((l, 2 * l), np.float32)
    er = np.zeros((l, 2 * l), np.float32)
    ei = np.zeros((l, 2 * l), np.float32)
    for tt in range(l):
        for kk in range(l):
            mr[kk, 2 * tt] = s * c[tt, kk].real
            mr[kk, 2 * tt + 1] = s * c[tt, kk].imag
            mi[kk, 2 * tt] = -s * c[tt, kk].imag
            mi[kk, 2 * tt + 1] = s * c[tt, kk].real
        er[tt, 2 * tt] = 1.0
        ei[tt, 2 * tt + 1] = 1.0
    # return NUMPY arrays: converting to jnp here would cache trace-local
    # constants when the first call happens inside a jit trace, leaking
    # tracers into every later trace that hits the cache (observed as
    # UnexpectedTracerError when two different flat steps are built in one
    # process); np operands convert per-trace for free at the @ use sites
    return mr, mi, er, ei


def synthetic_batch_flat(key: jax.Array, batch_size: int, cfg: DatagenConfig):
    """``synthetic_batch`` for the linear-AWGN config with flat ``[B, 2L]``
    interleaved-I/Q outputs and no FFT / complex ops.

    Draws the SAME PRNG stream as ``synthetic_batch`` (same split structure,
    same shapes, same order), so outputs equal
    ``synthetic_batch(...)["noisy"].reshape(B, 2L)`` to f32 matmul-vs-FFT
    rounding (parity: tests/test_flat_model.py). Built for the flat-layout
    fused train step (models/flat.py, bench.py --flat)."""
    if cfg.nonlinear or cfg.channel.kind != "awgn":
        raise ValueError("synthetic_batch_flat covers the linear AWGN config; "
                         "use synthetic_batch otherwise")
    l = cfg.frame_length
    mr, mi, er, ei = _flat_dft_mats(l)
    k_sym, k_imp, k_snr, k_ch = jax.random.split(key, 4)

    kr, ki = jax.random.split(k_sym)
    zr = jax.random.normal(kr, (batch_size, l), jnp.float32)
    zi = jax.random.normal(ki, (batch_size, l), jnp.float32)
    clean = zr @ mr + zi @ mi  # [B, 2L] interleaved I/Q, unit mean power

    snr = jax.random.uniform(
        k_snr, (batch_size,), jnp.float32, cfg.snr_min, cfg.snr_max
    )
    # channel_lib.awgn's stream: split(k_ch) -> (kr, ki), per-frame power of
    # the channel input, per-dimension sigma = sqrt(P/10^(SNR/10)/2)
    power = jnp.sum(clean * clean, axis=-1, keepdims=True) / l
    std = jnp.sqrt(power / (10.0 ** (snr[:, None] / 10.0)) / 2.0)
    kr2, ki2 = jax.random.split(k_ch)
    nr = jax.random.normal(kr2, (batch_size, l), jnp.float32)
    ni = jax.random.normal(ki2, (batch_size, l), jnp.float32)
    noisy = clean + std * (nr @ er + ni @ ei)

    # joint max-abs normalization (utils/iq.joint_max_normalize semantics)
    m = jnp.maximum(
        jnp.max(jnp.abs(noisy), axis=-1, keepdims=True),
        jnp.max(jnp.abs(clean), axis=-1, keepdims=True),
    )
    m = jnp.maximum(m, 1e-12)
    return {"noisy": noisy / m, "clean": clean / m, "snr": snr}


def test_batch_at_snr(key: jax.Array, batch_size: int, snr_db: float, cfg: DatagenConfig):
    """Fixed-SNR evaluation batch (reference utils/dataset.py:326-383,
    generate_test_samples): same pipeline, constant SNR, no impairments
    unless enabled in ``cfg``."""
    fixed = dataclasses.replace(cfg, snr_min=float(snr_db), snr_max=float(snr_db))
    out = synthetic_batch(key, batch_size, fixed)
    out["snr"] = jnp.full((batch_size,), float(snr_db), jnp.float32)
    return out
