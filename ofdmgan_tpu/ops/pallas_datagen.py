"""Pallas TPU kernel: fused synthetic OFDM frame generation.

The datagen hot path (signal/datagen.py) as a single Pallas kernel:
hardware PRNG -> Box-Muller normals -> spectrum -> inverse-DFT (MXU) ->
per-frame SNR -> AWGN — all resident in VMEM, one HBM write per output.

TPU-native layout trick: frames are only L=16 samples, far below the
128-lane vector width, so the kernel PACKS 8 frames per row
(``[rows, 128]``) and performs the inverse DFT as one matmul with a
BLOCK-DIAGONAL basis (8 copies of the 16x16 DFT matrix) — full MXU lane
utilization instead of 12.5%. Per-frame quantities (power, SNR) are
expanded across their 16 samples with a second structured matmul
(segment-sum / broadcast matrices), keeping everything on the MXU/VPU.

Two rationales vs the XLA lowering:
  * the hardware PRNG (pltpu.prng_random_bits) replaces threefry, which
    dominates the XLA datagen's instruction count;
  * normalization and layout conversion remain in the caller (cheap,
    fused by XLA into the consumer).

Currently implements the linear-AWGN configuration (the default training
config); the nonlinear-impairment path stays on the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.iq import joint_max_normalize

FRAME = 16
PACK = 128 // FRAME  # 8 frames per 128-lane row
_TWO_PI = 6.283185307179586


@functools.lru_cache(maxsize=None)
def _basis_matrices():
    """Block-diagonal inverse-DFT bases and per-frame broadcast matrices."""
    t = np.arange(FRAME)[:, None]
    k = np.arange(FRAME)[None, :]
    w = np.exp(2j * np.pi * t * k / FRAME) * np.sqrt(FRAME) / FRAME  # ifft*sqrt(L)
    bd_r = np.zeros((128, 128), np.float32)
    bd_i = np.zeros((128, 128), np.float32)
    seg_mean = np.zeros((128, 128), np.float32)  # frame-mean at every sample
    for f in range(PACK):
        s = slice(f * FRAME, (f + 1) * FRAME)
        # clean[row, s] = spec[row, s] @ w.T  (x @ bd with bd = w.T per block)
        bd_r[s, s] = w.real.T
        bd_i[s, s] = w.imag.T
        seg_mean[s, s] = 1.0 / FRAME
    return bd_r, bd_i, seg_mean


def _uniform01(shape):
    """(0,1) uniforms from hardware PRNG bits.

    prng_random_bits yields int32 lanes; mask to 23 positive bits before
    scaling (an arithmetic shift on the signed value would fold the sign in
    and produce uniforms on (-0.5, 0.5))."""
    bits = pltpu.prng_random_bits(shape)
    mantissa = jax.lax.shift_right_logical(bits, 9)
    return mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


def _normals(shape):
    """Standard normals via Box-Muller on hardware-PRNG uniforms."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _datagen_kernel(seed_ref, snr_ref, bdr_ref, bdi_ref, seg_ref,
                    noisy_r_ref, noisy_i_ref, clean_r_ref, clean_i_ref, snr_out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    rows = noisy_r_ref.shape[0]

    # spectrum ~ CN(0,1): each real dim N(0, 1/2)
    zr, zi = _normals((rows, 128))
    s_r = zr * jnp.float32(1.0 / np.sqrt(2.0))
    s_i = zi * jnp.float32(1.0 / np.sqrt(2.0))

    # inverse DFT on the MXU (block-diagonal basis): clean = s @ W_bd
    bdr = bdr_ref[:]
    bdi = bdi_ref[:]
    clean_r = (jnp.dot(s_r, bdr, preferred_element_type=jnp.float32)
               - jnp.dot(s_i, bdi, preferred_element_type=jnp.float32))
    clean_i = (jnp.dot(s_r, bdi, preferred_element_type=jnp.float32)
               + jnp.dot(s_i, bdr, preferred_element_type=jnp.float32))

    # per-frame mean power, broadcast to all 16 samples (segment matmul)
    power = jnp.dot(clean_r * clean_r + clean_i * clean_i, seg_ref[:],
                    preferred_element_type=jnp.float32)

    # per-frame SNR, constant across each frame's samples: draw one uniform
    # per 128 lanes and segment-mean it? No — draw per-sample then take the
    # frame's FIRST sample via the broadcast matrix trick would need a
    # selector; instead draw per-sample and make it frame-constant by
    # averaging ranks... simplest exact approach: draw per-sample uniforms,
    # then replace each frame's values with the frame MEAN of logits —
    # that changes the distribution. So: draw a per-sample uniform and kill
    # within-frame variation by segment-summing a masked copy (only sample 0
    # of each frame carries its value).
    u = _uniform01((rows, 128))
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    first = (lane % FRAME) == 0
    u_first = jnp.where(first, u, 0.0)
    u_frame = jnp.dot(u_first, seg_ref[:], preferred_element_type=jnp.float32) * FRAME
    snr_db = snr_ref[0] + (snr_ref[1] - snr_ref[0]) * u_frame

    noise_power = power * jnp.exp2(-snr_db * jnp.float32(np.log2(10.0) / 10.0))
    std = jnp.sqrt(noise_power * 0.5)
    nr, ni = _normals((rows, 128))
    noisy_r_ref[:] = clean_r + std * nr
    noisy_i_ref[:] = clean_i + std * ni
    clean_r_ref[:] = clean_r
    clean_i_ref[:] = clean_i
    snr_out_ref[:] = snr_db


def synthetic_batch_pallas(key: jax.Array, batch_size: int,
                           snr_min: float = 0.0, snr_max: float = 30.0,
                           tile_rows: int = 1024, interpret: bool = False):
    """Pallas-kernel datagen: AWGN config of signal/datagen.synthetic_batch.

    Returns the same dict contract: noisy/clean ``[B, 16, 2]`` jointly
    max-normalized, snr ``[B]``; ``batch_size`` must be a multiple of 8.

    ``tile_rows``: measured sweet spot is 1024 (8192 frames/tile): 969M
    frames/s on v5e vs 823M for the XLA lowering; 512 falls off a cliff
    (per-step overhead dominates) and >=2048 loses pipelining to VMEM
    pressure. ``interpret=True`` runs the kernel in the Pallas interpreter
    (CPU testing).
    """
    assert batch_size % PACK == 0, "batch must be a multiple of 8"
    rows = batch_size // PACK
    tile = min(tile_rows, rows)
    while rows % tile:
        tile //= 2
    grid = rows // tile

    bdr, bdi, seg = _basis_matrices()
    seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max, jnp.int32)
    snr_params = jnp.asarray([snr_min, snr_max], jnp.float32)

    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, snr bounds
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ] * 5,
    )
    noisy_r, noisy_i, clean_r, clean_i, snr_p = pl.pallas_call(
        _datagen_kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed, snr_params, jnp.asarray(bdr), jnp.asarray(bdi), jnp.asarray(seg))

    def unpack(x):
        return x.reshape(batch_size, FRAME)

    noisy = jnp.stack([unpack(noisy_r), unpack(noisy_i)], axis=-1)
    clean = jnp.stack([unpack(clean_r), unpack(clean_i)], axis=-1)
    snr = unpack(snr_p)[:, 0]
    noisy, clean = joint_max_normalize(noisy, clean)
    return {"noisy": noisy, "clean": clean, "snr": snr}
