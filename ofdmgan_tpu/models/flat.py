"""Flat-layout (relayout-free) applies for the mini generator/critic.

Every layer of the mini U-Net and critic is already a dense matmul on the
flattened frame (ops/dense_conv.py), but the standard flax path still
materializes ``[B, L, C]`` views between layers. On TPU each view change
can become a physical (8,128)-tile relayout pass over HBM, and the
nearest-neighbor upsamples / skip concat materialize further ``[B, L, C]``
intermediates. Device profiling of the fused train step
(results/profile_step_bf16mixed.json, scripts/profile_step.py) shows these
passes — not the matmuls — dominate: ~60 small HBM-bound fusions at ~2.2%
MXU time.

This module computes the SAME functions (same parameter trees, parity
tested in tests/test_flat_model.py) with activations kept ``[B, F]``
end-to-end:

* upsample_nearest_2x is a fixed 0/1 linear map ``U``; it is folded into
  the NEXT conv's dense matrix at trace time (``U @ A`` is a [32,64]@[64,32]
  matmul on parameters — free at batch scale), so no upsampled tensor is
  ever materialized;
* the critic's candidate/condition channel concat is split into TWO
  matmuls against row-slices of conv1's dense matrix — no concatenated
  input is materialized, and the gradient-penalty's grad w.r.t. the
  candidate flows through only the candidate matmul;
* the global sum pool + final Dense fold into one ``[F, 1]`` vector
  (``q[t*C+c] = dense_kernel[c]``), keeping the f32 pool accumulation of
  models/critic.py via the matmul's f32 accumulator.

Generator: 4 chained [B,32]@[32,32] matmuls + 1 add. Critic: 3 matmuls.

Behavioral parity target: reference models/generator.py:83-233 and
models/discriminator.py:21-76 — via exact numerical parity with
models/{generator,critic}.py (tolerance = f32 summation-order noise).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.nn import leaky_relu

from ..ops.dense_conv import conv1d_dense_matrix


def _upsample_matrix(l_in: int, c: int) -> np.ndarray:
    """Nearest-neighbor x2 upsample along L as a [l_in*c, 2*l_in*c] 0/1 map
    (flat index convention t*C + c, ops/dense_conv.py docstring)."""
    u = np.zeros((l_in * c, 2 * l_in * c), np.float32)
    for t in range(l_in):
        for ch in range(c):
            u[t * c + ch, (2 * t) * c + ch] = 1.0
            u[t * c + ch, (2 * t + 1) * c + ch] = 1.0
    return u


FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def _mm(h: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    # accumulate in the promoted dtype: bf16 storage x f32 weights -> f32
    # products/accumulator (same rule as ops/dense_conv.conv1d_via_matmul).
    # fp8 STORAGE reads as bf16 operands (exact upcast): fp8 is a storage
    # format here — HBM bytes halve again vs bf16 — while the MXU pass
    # stays the validated bf16-operand/f32-accumulate kernel; fp8 has no
    # implicit promotion path, so the upcast must be explicit.
    if h.dtype in FP8_DTYPES:
        h = h.astype(jnp.bfloat16)
    return jnp.matmul(h, a, preferred_element_type=jnp.promote_types(h.dtype, a.dtype))


def _dot_default(x, a):
    """One MXU pass (bf16 operands), f32 accumulation — explicit DEFAULT
    precision so no ambient default_matmul_precision context leaks in."""
    return jax.lax.dot_general(
        x, a, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


@jax.custom_jvp
def tf32_matmul(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Tensorfloat32-equivalent matmul as an explicit bf16x3 MXU
    decomposition: ``x@a ~ xh@ah + xh@al + xl@ah`` with f32 accumulation
    (~19 mantissa bits carried — the same error-compensated scheme XLA's
    precision=HIGH uses on the MXU).

    Why not just precision=HIGH: inside the fused train step XLA lowers the
    GP chain's HIGH-precision dots with batch-in-lanes VPU convolution
    emitters at ~5x the MXU cost (profile: results/profile_step_flat.json,
    broadcast_compare_fusion at 162k estimated cycles). The explicit
    decomposition pins every pass to the fast DEFAULT MXU path. custom_jvp
    recursion makes ALL derivative orders (the GP needs grad-of-grad) use
    the same decomposition, so the validated ">= tf32 through the whole GP
    chain" stability property (results/RESULTS.md §tf32) is preserved in
    forward, reverse, and second-order transposes alike."""
    f32 = jnp.float32
    if x.dtype == jnp.bfloat16 or x.dtype in FP8_DTYPES:
        # sub-bf16 storage upcasts exactly into the high half; no residual
        xh, xl = x.astype(jnp.bfloat16), None
    else:
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
    if a.dtype == jnp.bfloat16:
        ah, al = a, None
    else:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(f32)).astype(jnp.bfloat16)
    y = _dot_default(xh, ah)
    if al is not None:
        y = y + _dot_default(xh, al)
    if xl is not None:
        y = y + _dot_default(xl, ah)
    return y


@tf32_matmul.defjvp
def _tf32_matmul_jvp(primals, tangents):
    x, a = primals
    dx, da = tangents
    y = tf32_matmul(x, a)
    dy = tf32_matmul(dx, a) + tf32_matmul(x.astype(jnp.float32), da)
    return y, dy


def make_generator_flat_parts(
    frame_length: int = 16,
    input_channels: int = 2,
    output_channels: int = 2,
    enc1_channels: int = 4,
    bottleneck_channels: int = 8,
    dec1_channels: int = 4,
    leaky_slope: float = 0.2,
    act_dtype: str | None = None,
    input_residual: bool = False,
    mm: str = "ambient",
) -> tuple[Callable, Callable]:
    """Returns ``(premap, apply_mats)`` with
    ``apply_mats(premap(variables), x) == make_generator_flat_apply(...)``.

    The split lets the train step expand the Toeplitz matrices ONCE per
    parameter value (training/wgan_gp.py ``gen_premap``) instead of once
    per apply site: autodiff then accumulates all apply-site cotangents
    into the dense matrices (matmul transposes — MXU work) and runs ONE
    scatter-free band-sum transpose per matrix
    (ops/dense_conv.conv1d_dense_matrix_scatterfree), eliminating the
    per-site dynamic-update-slice chains that cost 9.3% of device time in
    round 3 (results/op_table_r3_headline.json)."""
    L = frame_length
    u1 = jnp.asarray(_upsample_matrix(L // 4, bottleneck_channels))
    u2 = jnp.asarray(_upsample_matrix(L // 2, dec1_channels))
    cast = (lambda a: a.astype(act_dtype)) if act_dtype else (lambda a: a)
    dot = {"ambient": _mm, "tf32x3": tf32_matmul}[mm]

    def premap(variables):
        p = variables["params"]
        a_e = conv1d_dense_matrix(p["enc1"]["conv_kernel"], L, 2, 1)
        b_e = jnp.tile(p["enc1"]["conv_bias"], L // 2)
        a_b = conv1d_dense_matrix(p["bottleneck"]["conv_kernel"], L // 2, 2, 1)
        b_b = jnp.tile(p["bottleneck"]["conv_bias"], L // 4)
        a_d = u1 @ conv1d_dense_matrix(p["dec1"]["conv_kernel"], L // 2, 1, 1)
        b_d = jnp.tile(p["dec1"]["conv_bias"], L // 2)
        a_o = u2 @ conv1d_dense_matrix(p["out_conv_kernel"], L, 1, 1)
        b_o = jnp.tile(p["out_conv_bias"], L)
        return (a_e, b_e, a_b, b_b, a_d, b_d, a_o, b_o)

    def apply_mats(mats, x):
        a_e, b_e, a_b, b_b, a_d, b_d, a_o, b_o = mats
        xf = x.reshape(x.shape[0], L * input_channels)
        h1 = cast(leaky_relu(dot(xf, a_e) + b_e, leaky_slope))
        h2 = cast(leaky_relu(dot(h1, a_b) + b_b, leaky_slope))
        h3 = cast(leaky_relu(dot(h2, a_d) + b_d, leaky_slope))
        h4 = h3 + h1  # additive skip (generator.py:171)
        out = dot(h4, a_o) + b_o
        y = xf.astype(out.dtype) + out if input_residual else jnp.tanh(out)
        return y.reshape(x.shape[0], L, output_channels) if x.ndim == 3 else y

    return premap, apply_mats


def make_generator_flat_apply(
    frame_length: int = 16,
    input_channels: int = 2,
    output_channels: int = 2,
    enc1_channels: int = 4,
    bottleneck_channels: int = 8,
    dec1_channels: int = 4,
    leaky_slope: float = 0.2,
    act_dtype: str | None = None,
    input_residual: bool = False,
    mm: str = "ambient",
) -> Callable:
    """Returns ``apply(variables, x) -> y`` numerically matching
    ``MiniGenerator(...).apply`` for the standard (non-QAT, non-RTL) config.
    ``x`` may be ``[B, L, C]`` or flat ``[B, L*C]``; output shape follows.

    ``mm`` selects the batch-side matmul implementation — see
    ``make_critic_flat_apply``. The tiny parameter-side folds (``U @ A``)
    always ride the ambient precision (f32 operands, loop-invariant cost)."""
    premap, apply_mats = make_generator_flat_parts(
        frame_length, input_channels, output_channels, enc1_channels,
        bottleneck_channels, dec1_channels, leaky_slope, act_dtype,
        input_residual, mm)

    def apply(variables, x):
        return apply_mats(premap(variables), x)

    return apply


def make_critic_flat_parts(
    frame_length: int = 16,
    conv1_channels: int = 8,
    conv2_channels: int = 16,
    leaky_slope: float = 0.2,
    act_dtype: str | None = None,
    mm: str = "ambient",
) -> tuple[Callable, Callable]:
    """Returns ``(premap, apply_mats)`` — the expansion-once split of
    ``make_critic_flat_apply`` (see ``make_generator_flat_parts``).

    The concat split uses KERNEL channel slices (``w[:, :2, :]`` /
    ``w[:, 2:, :]``) rather than dense-matrix row gathers: identical values
    (the Toeplitz expansion is per-input-channel), and a slice's autodiff
    transpose is a pad — fused — where a gather's is a scatter."""
    L = frame_length
    cast = (lambda a: a.astype(act_dtype)) if act_dtype else (lambda a: a)
    dot = {"ambient": _mm, "tf32x3": tf32_matmul}[mm]

    def premap(variables):
        p = variables["params"]
        # concat flat index t*4 + {0,1}=candidate, {2,3}=condition; split
        # conv1's KERNEL channels so the concat never materializes:
        # expand(w[:, :2, :]) rows at t*2+c equal expand(w)'s rows at t*4+c
        w1 = p["conv1_kernel"]
        a1c = conv1d_dense_matrix(w1[:, :2, :], L, 2, 1)
        a1d = conv1d_dense_matrix(w1[:, 2:, :], L, 2, 1)
        b1 = jnp.tile(p["conv1_bias"], L // 2)
        a2 = conv1d_dense_matrix(p["conv2_kernel"], L // 2, 2, 1)
        b2 = jnp.tile(p["conv2_bias"], L // 4)
        # pool+dense folded: q[t*C+c] = dense_kernel[c, 0]
        q = jnp.tile(p["dense"]["kernel"][:, 0], L // 4)[:, None]
        return (a1c, a1d, b1, a2, b2, q, p["dense"]["bias"])

    def apply_mats(mats, candidate, condition):
        a1c, a1d, b1, a2, b2, q, bias = mats
        b = candidate.shape[0]
        candf = candidate.reshape(b, L * 2)
        condf = condition.reshape(b, L * 2)
        z1 = dot(candf, a1c) + dot(condf, a1d) + b1
        h1 = cast(leaky_relu(z1, leaky_slope))
        h2 = leaky_relu(dot(h1, a2) + b2, leaky_slope)
        # h2 @ q accumulates in f32 (q is f32) = the f32 sum pool of
        # models/critic.py:48
        return dot(h2, q) + bias

    return premap, apply_mats


def make_critic_flat_apply(
    frame_length: int = 16,
    conv1_channels: int = 8,
    conv2_channels: int = 16,
    leaky_slope: float = 0.2,
    act_dtype: str | None = None,
    mm: str = "ambient",
) -> Callable:
    """Returns ``apply(variables, candidate, condition) -> [B, 1]``
    numerically matching ``MiniDiscriminator(...).apply``.

    ``mm="ambient"``: dots follow the ambient default_matmul_precision
    (the W-chain). ``mm="tf32x3"``: every dot is the explicit bf16x3 MXU
    decomposition (``tf32_matmul``) regardless of ambient context — built
    for the gradient-penalty chain, whose HIGH-precision dots XLA otherwise
    lowers through ~5x-slower VPU emitters (see tf32_matmul docstring)."""
    premap, apply_mats = make_critic_flat_parts(
        frame_length, conv1_channels, conv2_channels, leaky_slope,
        act_dtype, mm)

    def apply(variables, candidate, condition):
        return apply_mats(premap(variables), candidate, condition)

    return apply
