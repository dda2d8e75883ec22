"""Pallas TPU kernel: fused synthetic OFDM frame generation.

The datagen hot path (signal/datagen.py) as a single Pallas kernel:
hardware PRNG -> Box-Muller normals -> spectrum -> inverse-DFT (MXU) ->
optional nonlinear RF impairments -> per-frame SNR -> AWGN — all resident
in VMEM, one HBM write per output.

TPU-native layout tricks:
  * frames shorter than the 128-lane vector width are PACKED ``128 // L``
    per row and the inverse DFT becomes one matmul with a BLOCK-DIAGONAL
    basis (copies of the LxL DFT matrix) — full MXU lane utilization
    instead of L/128;
  * per-frame quantities (power, SNR) are expanded across each frame's L
    samples with segment-mean matmuls (structured broadcast on the MXU);
  * the Wiener phase-noise prefix sum (theta = cumsum(increments)) — the
    piece SURVEY.md §7.3 flags as the costly sequential op — is computed as
    a matmul with a block LOWER-TRIANGULAR ones matrix: the MXU does the
    scan, no sequential loop;
  * frames of length >= 128 (multiples of 128, e.g. the 1024-sample full
    U-Net family) use the same kernel un-packed with full LxL bases.

Supported configuration (the training defaults): AWGN channel, linear or
the nonlinear chain Rapp PA -> IQ imbalance -> Wiener phase noise
(reference apply_all order, utils/ofdm_utils.py:570-605; DC/CFO are
disabled in the reference's dataset too, utils/dataset.py:251-264).
Saleh PA / DC / CFO / fading channels stay on the XLA implementation.

Honest perf notes (hard-synced, v5e):
  * L=16: kernel 106M frames/s linear / 97M nonlinear vs XLA's fusion of
    the jnp lowering at 148M / 118M — XLA already fuses this chain well;
    the kernel is kept as the hand-scheduled baseline, for the
    hardware-PRNG path, and as the template for fusing datagen INTO
    consumers where XLA cannot.
  * The matmul IDFT/prefix-sum approach is O(L²) per frame vs the FFT's
    O(L log L), so it is the right trade only in the packed short-frame
    regime (L <= 128, where the matmuls buy full lane utilization); for
    L >= 256 use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.iq import joint_max_normalize

_TWO_PI = 6.283185307179586


def _pack(frame_length: int) -> int:
    """Frames per row (lane packing factor)."""
    if frame_length <= 128:
        if 128 % frame_length:
            raise ValueError(f"frame_length {frame_length} must divide 128")
        return 128 // frame_length
    if frame_length % 128:
        raise ValueError(f"frame_length {frame_length} must be a multiple of 128")
    return 1


@functools.lru_cache(maxsize=None)
def _basis_matrices(frame_length: int):
    """Block-diagonal inverse-DFT bases, per-frame segment-mean matrix and
    block lower-triangular (inclusive) prefix-sum matrix, all [W, W] with
    W = max(frame_length, 128)."""
    L = frame_length
    pack = _pack(L)
    W = L * pack
    t = np.arange(L)[:, None]
    k = np.arange(L)[None, :]
    w = np.exp(2j * np.pi * t * k / L) * np.sqrt(L) / L  # ifft * sqrt(L)
    bd_r = np.zeros((W, W), np.float32)
    bd_i = np.zeros((W, W), np.float32)
    seg_mean = np.zeros((W, W), np.float32)  # frame-mean at every sample
    tril = np.zeros((W, W), np.float32)      # within-frame inclusive cumsum
    for f in range(pack):
        s = slice(f * L, (f + 1) * L)
        # clean[row, s] = spec[row, s] @ w.T  (x @ bd with bd = w.T per block)
        bd_r[s, s] = w.real.T
        bd_i[s, s] = w.imag.T
        seg_mean[s, s] = 1.0 / L
        tril[s, s] = np.tril(np.ones((L, L), np.float32)).T  # theta = incr @ T
    return bd_r, bd_i, seg_mean, tril


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


def _make_kernel(frame_length: int, nonlinear: bool,
                 pa_saturation: float, pa_smoothness: float,
                 iq_amplitude_db: float, iq_phase_deg: float,
                 pn_sigma: float):
    """Build the kernel body for a static configuration (all impairment
    parameters fold into compile-time constants)."""
    L = frame_length
    W = L * _pack(L)

    def kernel(seed_ref, snr_ref, bdr_ref, bdi_ref, seg_ref, tri_ref,
               noisy_r_ref, noisy_i_ref, clean_r_ref, clean_i_ref, snr_out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        rows = noisy_r_ref.shape[0]

        # spectrum ~ CN(0,1): each real dim N(0, 1/2)
        zr, zi = _normals((rows, W))
        s_r = zr * jnp.float32(1.0 / np.sqrt(2.0))
        s_i = zi * jnp.float32(1.0 / np.sqrt(2.0))

        # inverse DFT on the MXU (block-diagonal basis): clean = s @ W_bd
        bdr = bdr_ref[:]
        bdi = bdi_ref[:]
        clean_r = (jnp.dot(s_r, bdr, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                   - jnp.dot(s_i, bdi, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))
        clean_i = (jnp.dot(s_r, bdi, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                   + jnp.dot(s_i, bdr, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))

        x_r, x_i = clean_r, clean_i
        if nonlinear:
            # Rapp PA AM/AM (impairments.pa_rapp): gain = (1+u^p)^(-1/(2p))
            # with u = (amp/A)^2 — even powers avoid pow() entirely for the
            # default smoothness p=3.
            a2 = (x_r * x_r + x_i * x_i) * jnp.float32(1.0 / pa_saturation**2)
            p = pa_smoothness
            if float(p) == 3.0:
                u_p = a2 * a2 * a2
            else:
                u_p = jnp.exp(jnp.float32(p) * jnp.log(jnp.maximum(a2, 1e-30)))
            gain = jnp.exp(jnp.float32(-1.0 / (2.0 * p)) * jnp.log1p(u_p))
            x_r = x_r * gain
            x_i = x_i * gain

            # IQ imbalance (impairments.iq_imbalance): Q' = g(cosφ Q + sinφ I)
            g = 10.0 ** (iq_amplitude_db / 20.0)
            phi = np.deg2rad(iq_phase_deg)
            x_i = jnp.float32(g) * (jnp.float32(np.cos(phi)) * x_i
                                    + jnp.float32(np.sin(phi)) * x_r)

            # Wiener phase noise: theta = within-frame cumsum of N(0, σ²)
            # increments — prefix sum as a block-triangular MXU matmul.
            w1, _ = _normals((rows, W))
            theta = jnp.dot(w1 * jnp.float32(pn_sigma), tri_ref[:],
                            preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            c, s = jnp.cos(theta), jnp.sin(theta)
            x_r, x_i = x_r * c - x_i * s, x_r * s + x_i * c

        # per-frame mean power of the DISTORTED signal (channel.awgn measures
        # its input's power), broadcast to all L samples (segment matmul)
        power = jnp.dot(x_r * x_r + x_i * x_i, seg_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

        # per-frame SNR, constant across the frame's samples: draw
        # per-sample uniforms, keep only each frame's first sample, and
        # broadcast it with the segment-mean matmul (x L undoes the mean).
        u = _uniform01((rows, W))
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        first = (lane % L) == 0
        u_first = jnp.where(first, u, 0.0)
        u_frame = jnp.dot(u_first, seg_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * L
        snr_db = snr_ref[0] + (snr_ref[1] - snr_ref[0]) * u_frame

        noise_power = power * jnp.exp2(-snr_db * jnp.float32(np.log2(10.0) / 10.0))
        std = jnp.sqrt(noise_power * 0.5)
        nr, ni = _normals((rows, W))
        noisy_r_ref[:] = x_r + std * nr
        noisy_i_ref[:] = x_i + std * ni
        clean_r_ref[:] = clean_r
        clean_i_ref[:] = clean_i
        snr_out_ref[:] = snr_db

    return kernel


def synthetic_batch_pallas(key: jax.Array, batch_size: int,
                           snr_min: float = 0.0, snr_max: float = 30.0,
                           frame_length: int = 16,
                           nonlinear: bool = False,
                           pa_saturation: float = 1.0,
                           pa_smoothness: float = 3.0,
                           iq_amplitude_db: float = 1.0,
                           iq_phase_deg: float = 5.0,
                           phase_noise_dbchz: float = -80.0,
                           sample_rate: float = 1e6,
                           tile_rows: int = 1024, interpret: bool = False):
    """Pallas-kernel datagen: AWGN config of signal/datagen.synthetic_batch,
    linear or nonlinear (Rapp PA + IQ imbalance + Wiener phase noise —
    reference apply_all defaults, utils/dataset.py:251-264).

    Returns the same dict contract: noisy/clean ``[B, L, 2]`` jointly
    max-normalized, snr ``[B]``; ``batch_size`` must be a multiple of the
    per-row packing (128 // L for L <= 128). The clean target stays the
    pre-impairment frame (the reference quirk kept on purpose).

    ``tile_rows``: rows per grid step; 1024 measured best at L=16 on v5e.
    ``interpret=True`` runs the Pallas interpreter (CPU testing).
    """
    L = frame_length
    pack = _pack(L)
    W = L * pack
    assert batch_size % pack == 0, f"batch must be a multiple of {pack}"
    rows = batch_size // pack
    # VMEM budget: 4 [W, W] f32 bases + ~10 [tile, W] f32 live arrays must
    # fit the scoped-vmem window (raised below via vmem_limit_bytes for
    # W > 128; Mosaic's default window is 16 MiB)
    base_bytes = 4 * W * W * 4
    vmem_limit = min(100 << 20, max(16 << 20, base_bytes * 2))
    tile_cap = max(8, min(tile_rows, (vmem_limit - base_bytes) // (12 * 4 * W)))
    tile = min(tile_cap, rows)
    while rows % tile:
        tile -= 1
    grid = rows // tile

    bdr, bdi, seg, tri = _basis_matrices(L)
    seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max, jnp.int32)
    snr_params = jnp.asarray([snr_min, snr_max], jnp.float32)
    pn_sigma = float(np.sqrt(10.0 ** (phase_noise_dbchz / 10.0) * sample_rate))

    kernel = _make_kernel(L, nonlinear, pa_saturation, pa_smoothness,
                          iq_amplitude_db, iq_phase_deg, pn_sigma)

    out_shape = [jax.ShapeDtypeStruct((rows, W), jnp.float32)] * 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, snr bounds
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((W, W), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] * 4,
        out_specs=[
            pl.BlockSpec((tile, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ] * 5,
    )
    noisy_r, noisy_i, clean_r, clean_i, snr_p = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(seed, snr_params, jnp.asarray(bdr), jnp.asarray(bdi), jnp.asarray(seg),
      jnp.asarray(tri))

    def unpack(x):
        return x.reshape(batch_size, L)

    noisy = jnp.stack([unpack(noisy_r), unpack(noisy_i)], axis=-1)
    clean = jnp.stack([unpack(clean_r), unpack(clean_i)], axis=-1)
    snr = unpack(snr_p)[:, 0]
    noisy, clean = joint_max_normalize(noisy, clean)
    return {"noisy": noisy, "clean": clean, "snr": snr}
