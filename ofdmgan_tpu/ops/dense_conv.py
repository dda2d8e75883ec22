"""Micro-conv1d as a structured dense matmul — the MXU-friendly lowering.

The reference's models are 1-D convs over 16-sample frames with 2-16
channels (reference models/generator.py:95-102). On TPU such convs are far
too small to tile the 128x128 MXU as convolutions; but each layer maps a
frame of ``L_in*C_in`` values to ``L_out*C_out`` values, both <= 64, so the
whole layer is exactly one ``[B, L_in*C_in] @ [L_in*C_in, L_out*C_out]``
matmul with a *structured* (block-sparse Toeplitz) weight matrix scattered
from the tiny conv kernel. The scatter is built from static Python loops at
trace time, costs nothing at runtime (XLA folds it into the weight tensor),
and gradients flow through it to the conv kernel. With a large batch this
keeps the GAN's entire forward/backward on the MXU.

Flattening convention: a frame ``[L, C]`` (channels-last) flattens row-major
to ``[L*C]``, i.e. index ``t*C + c``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def conv1d_output_length(l_in: int, kernel: int, stride: int, padding: int) -> int:
    return (l_in + 2 * padding - kernel) // stride + 1


# How conv1d_dense_matrix builds the Toeplitz expansion:
#   "dus"    — chain of .at[].add() dynamic-update-slices (the original).
#              On-chip profiling of the fused train step
#              (results/op_table_r3_headline.json) attributes 11.4% of
#              device time to this line: the forward DUS chains rebuild
#              per apply, and their autodiff TRANSPOSE is a scatter-add
#              per tap-block (9.3% of the step is dynamic-update-slice).
#   "onehot" — one broadcast-multiply-reduce against a constant 0/1
#              placement tensor P[k, t_in, t_out]:
#              A[(a,i),(b,o)] = sum_k w[k,i,o] * P[k,a,b].
#              Exactly one P entry is nonzero per (a,b) (kk = t_in -
#              stride*t_out + padding is unique), so the f32 result is
#              BIT-EXACT vs "dus" (adding 0.0 terms is exact); kept on
#              the VPU deliberately — an MXU dot would round the f32
#              weights to bf16 operands. The backward w.r.t. w is a
#              fused reduce over (a,b) — no scatter-add.
# NOT the queue-3 gather rewrite (results/r3_perf_queue3.jsonl): that
# replaced the forward expansion with a gather of an index map, which
# lowers badly on TPU; this keeps forward AND backward as dense fused
# elementwise ops. Module-level switch so bench.py/train.py can flip the
# whole model family at once.
CONV_EXPAND = "dus"


@functools.lru_cache(maxsize=None)
def _placement_np(k: int, l_in: int, l_out: int, stride: int, padding: int):
    """Constant 0/1 placement tensor [k, l_in, l_out] (numpy — cache numpy
    and convert at use: caching jnp arrays leaks tracers if first called
    inside a trace, see CLAUDE.md)."""
    import numpy as np
    p = np.zeros((k, l_in, l_out), np.float32)
    for t_out in range(l_out):
        for kk in range(k):
            t_in = stride * t_out - padding + kk
            if 0 <= t_in < l_in:
                p[kk, t_in, t_out] = 1.0
    return p


def conv1d_dense_matrix_scatterfree(
    w: jnp.ndarray, l_in: int, stride: int, padding: int
) -> jnp.ndarray:
    """The "onehot" Toeplitz expansion, unconditionally: one broadcast-
    multiply-reduce of ``w`` against the constant 0/1 placement tensor.

    BIT-EXACT equal to the DUS-chain expansion (exactly one placement entry
    is nonzero per output cell, and adding 0.0 terms is exact in f32), but
    every derivative order is a fused dense contraction — the forward is an
    elementwise multiply-reduce, and its autodiff transpose is the band-sum
    ``dw[k,i,o] = Σ_{a,b} P[k,a,b]·dA[(a,i),(b,o)]`` — so no
    dynamic-update-slice / scatter-add ever appears in the train step
    (round-3 op table attributed 9.3% of device time to the DUS backward,
    results/op_table_r3_headline.json; the premapped flat path,
    models/flat.make_*_flat_parts, builds on this).
    """
    k, cin, cout = w.shape
    l_out = conv1d_output_length(l_in, k, stride, padding)
    p = jnp.asarray(_placement_np(k, l_in, l_out, stride, padding), w.dtype)
    # [k,1,cin,1,cout] * [k,l_in,1,l_out,1] -> sum_k -> [l_in,cin,l_out,cout]
    a = (w[:, None, :, None, :] * p[:, :, None, :, None]).sum(0)
    return a.reshape(l_in * cin, l_out * cout)


def conv1d_dense_matrix(w: jnp.ndarray, l_in: int, stride: int, padding: int) -> jnp.ndarray:
    """Expand a conv kernel ``[K, C_in, C_out]`` into the equivalent dense
    matrix ``[L_in*C_in, L_out*C_out]`` for zero-padded strided conv1d.

    ``y.reshape(B, L_out*C_out) = x.reshape(B, L_in*C_in) @ A``.
    """
    k, cin, cout = w.shape
    l_out = conv1d_output_length(l_in, k, stride, padding)
    if CONV_EXPAND == "onehot":
        return conv1d_dense_matrix_scatterfree(w, l_in, stride, padding)
    a = jnp.zeros((l_in * cin, l_out * cout), dtype=w.dtype)
    for t_out in range(l_out):
        for kk in range(k):
            t_in = stride * t_out - padding + kk
            if 0 <= t_in < l_in:
                a = a.at[
                    t_in * cin : (t_in + 1) * cin,
                    t_out * cout : (t_out + 1) * cout,
                ].add(w[kk])
    return a


# Lane packing: a [B, F]x[F, F'] micro-matmul with F, F' <= 64 lights up
# only (F x F')/128^2 of the MXU systolic array, so packing p =
# 128//max(F, F') consecutive frames per row against the block-diagonal
# kron(I_p, A) looked like a 2x win on paper. MEASURED RESULT (v5e, full
# train step, hard-synced): 0.5M frames/s vs 10.5M unpacked — a 20x
# REGRESSION despite the compiled program showing only the expected 1.8x
# FLOP increase and equal bytes (XLA cost analysis). The [B, 64] ->
# [B/2, 128] reshapes are row-major no-ops on paper but cross the TPU's
# (8, 128) physical tile boundary, so every layer transition compiles to a
# relayout shuffle that dwarfs the MXU savings. Kept OFF; the code path +
# numerics test remain as the record of the experiment. If revisited, the
# packed layout must be carried END-TO-END through the model (including
# elementwise ops and datagen) so no per-layer relayout exists.
LANE_PACK = False


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _packed_matmul(x: jnp.ndarray, a: jnp.ndarray, pack: int) -> jnp.ndarray:
    """``x [B, F] @ a [F, G]`` computed as ``pack`` frames per 128-lane row
    against the block-diagonal ``kron(I_pack, a)``.

    custom_jvp so no adjoint ever differentiates THROUGH the kron
    construction (naive autodiff of it is ~20x slower than the unpacked
    matmul): the tangent w.r.t. ``a`` uses the mathematically-equal
    UNPACKED form, whose transpose is the efficient [F,B]@[B,G]
    accumulation; the tangent w.r.t. ``x`` recurses into the packed form.
    The rule is built from plain linear primitives, so it remains
    arbitrarily differentiable (the GP's grad-of-grad needs second order).
    """
    b, f = x.shape
    a_bd = jnp.kron(jnp.eye(pack, dtype=a.dtype), a)
    y = jnp.matmul(x.reshape(b // pack, pack * f), a_bd,
                   preferred_element_type=x.dtype)
    return y.reshape(b, a.shape[1])


@_packed_matmul.defjvp
def _packed_matmul_jvp(pack, primals, tangents):
    x, a = primals
    dx, da = tangents
    y = _packed_matmul(x, a, pack)
    dy = (_packed_matmul(dx, a, pack)
          + jnp.matmul(x, da, preferred_element_type=x.dtype))
    return y, dy


def conv1d_via_matmul(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, stride: int, padding: int
) -> jnp.ndarray:
    """Channels-last conv1d ``[B, L, C_in] -> [B, L_out, C_out]`` lowered to a
    single dense matmul on the flattened frame (lane-packed when possible)."""
    batch_shape = x.shape[:-2]
    l_in, cin = x.shape[-2:]
    k, wcin, cout = w.shape
    assert wcin == cin, (wcin, cin)
    a = conv1d_dense_matrix(w, l_in, stride, padding)
    l_out = conv1d_output_length(l_in, k, stride, padding)
    fin, fout = l_in * cin, l_out * cout
    xf = x.reshape(*batch_shape, fin)
    if xf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # fp8 is storage-only: exact upcast to the validated bf16-operand
        # MXU kernel (fp8 has no implicit promotion path; models/flat._mm
        # applies the same rule on the flat path)
        xf = xf.astype(jnp.bfloat16)
    pack = 128 // max(fin, fout) if LANE_PACK else 1
    if (pack > 1 and len(batch_shape) == 1
            and isinstance(batch_shape[0], int) and batch_shape[0] % pack == 0):
        y = _packed_matmul(xf, a, pack)
    else:
        # accumulate in the PROMOTED dtype: with bf16-stored activations
        # (x bf16, weights f32) the MXU products/accumulator stay f32 —
        # bf16 is a STORAGE format here, not a compute format
        y = jnp.matmul(xf, a, preferred_element_type=jnp.promote_types(xf.dtype, a.dtype))
    y = y.reshape(*batch_shape, l_out, cout)
    if b is not None:
        y = y + b
    return y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample along the length axis of ``[..., L, C]``
    (reference models/generator.py:141,154 nn.Upsample mode='nearest')."""
    return jnp.repeat(x, 2, axis=-2)
