"""Pallas TPU kernel: fully-fused WGAN-GP critic gradient step.

The critic update is ~95% of the training step's cost (5 n_critic
iterations, each = 2 critic forwards + a nested-grad gradient penalty +
backprop; results/RESULTS.md §Perf analysis). The XLA lowering round-trips
every [B, 64] activation through HBM between the ~20 small matmuls of one
critic-gradient evaluation — ~39 KB of HBM traffic per frame per step
(XLA cost analysis), about half the step time. This kernel computes the
ENTIRE critic loss gradient — D(real), D(fake), the interpolated forward,
the gradient-penalty chain including its second-order parameter gradients
(hand-derived below), and all parameter-gradient accumulations — for a
block of frames entirely in VMEM, writing only the [64, 64]-sized gradient
accumulators and metric sums back to HBM.

Math (hand-derived reverse + forward-over-reverse, validated to 1e-5
against jax.grad of training/wgan_gp.critic_loss_fn in
tests/test_pallas_critic.py):

  forward   z1 = h0 A1 + b1,  a1 = m1*z1 (leaky),  z2 = a1 A2 + b2,
            a2 = m2*z2,  y = a2 · q2 + bd           with q2 = P w
  penalty   g  = ((m2*q2) A2ᵀ * m1) A1ᵀ             (∂y/∂h0, masks frozen
            gc = g * sel_candidate,  n = sqrt(Σ gc² + 1e-12)
  ∂GP/∂θ    c  = 2λ(n-1)/(nB) · gc                  (exact product rule)
            ∂A1 += cᵀ e1,  ∂A2 += ĉ1ᵀ e2,  ∂w += (ĉ2) P-reduced
            with e2 = m2*q2, e1 = m1*(e2 A2ᵀ), ĉ1 = (c A1)*m1,
            ĉ2 = (ĉ1 A2)*m2  — the leaky-relu masks have zero second
            derivative a.e., exactly what jax.grad-of-grad computes.

Parameter gradients are accumulated w.r.t. the DENSE (block-Toeplitz)
layer matrices (ops/dense_conv.py lowering) and mapped back to the raw
conv kernels with jax.vjp of the scatter itself, so the mapping cannot
drift from the XLA path. The per-sample interpolation epsilons come from
the host (same jax.random stream as models/critic.compute_gradient_penalty)
so the fused step is EXACTLY the same stochastic function as the unfused
one — parity is bitwise-level testable, not just distributional.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense_conv import conv1d_dense_matrix

IN, H1, H2, PO = 64, 64, 64, 16  # h0 width, conv1 out, conv2 out, pool out
_PRECISION = {
    "float32": jax.lax.Precision.HIGHEST,
    # Mosaic dots support only DEFAULT/HIGHEST; round tf32 UP to full f32
    "tensorfloat32": jax.lax.Precision.HIGHEST,
    "bfloat16": jax.lax.Precision.DEFAULT,
}


def _pool_matrix(l_out: int = 4, cout: int = 16) -> np.ndarray:
    """Global-sum-pool as a [l_out*cout, cout] 0/1 matrix."""
    p = np.zeros((l_out * cout, cout), np.float32)
    for t in range(l_out):
        for c in range(cout):
            p[t * cout + c, c] = 1.0
    return p


def critic_dense_mats(params_d: Any) -> Dict[str, jnp.ndarray]:
    """Raw critic params -> dense layer matrices (the same lowering the
    flax model's matmul path uses, ops/dense_conv.py)."""
    p = params_d["params"]
    if (p["conv1_kernel"].shape, p["conv2_kernel"].shape) != ((3, 4, 8), (3, 8, 16)):
        raise ValueError(
            "fused critic kernel covers the mini 16-sample architecture "
            f"(got conv shapes {p['conv1_kernel'].shape}, {p['conv2_kernel'].shape})"
        )
    a1 = conv1d_dense_matrix(p["conv1_kernel"], 16, 2, 1)        # [64, 64]
    a2 = conv1d_dense_matrix(p["conv2_kernel"], 8, 2, 1)         # [64, 64]
    b1 = jnp.tile(p["conv1_bias"], 8)                            # [64]
    b2 = jnp.tile(p["conv2_bias"], 4)                            # [64]
    w = p["dense"]["kernel"][:, 0]                               # [16]
    pmat = jnp.asarray(_pool_matrix())
    return {
        "a1": a1, "a2": a2, "b1": b1, "b2": b2, "w": w,
        "q2": pmat @ w, "pmat": pmat, "bd": p["dense"]["bias"][0],
    }


def dense_grads_to_params(gA1, gb1, gA2, gb2, gw, params_d) -> Any:
    """Map dense-matrix gradients back to the raw parameter tree via the
    vjp of the Toeplitz scatter (exact transpose by construction)."""
    p = params_d["params"]
    _, vjp1 = jax.vjp(lambda w: conv1d_dense_matrix(w, 16, 2, 1), p["conv1_kernel"])
    _, vjp2 = jax.vjp(lambda w: conv1d_dense_matrix(w, 8, 2, 1), p["conv2_kernel"])
    return {"params": {
        "conv1_kernel": vjp1(gA1)[0],
        "conv1_bias": gb1.reshape(8, 8).sum(0),
        "conv2_kernel": vjp2(gA2)[0],
        "conv2_bias": gb2.reshape(4, 16).sum(0),
        "dense": {"kernel": gw[:PO, None],
                  "bias": jnp.zeros_like(p["dense"]["bias"])},
    }}


def _kernel(h0r_ref, h0f_ref, eps_ref, a1_ref, a2_ref, p_ref, vecs_ref,
            ga1_ref, ga2_ref, out_ref, *, slope, gp_weight, inv_b, dot_prec):
    """One grid step = one block of frames; accumulates into the outputs."""
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32,
                            precision=dot_prec)

    def dotT(x, y):  # x [B, K], y [B, N] -> xᵀy [K, N]
        return jax.lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=dot_prec)

    def dotR(x, a):  # x [B, N] @ a[K, N]ᵀ -> [B, K]
        return jax.lax.dot_general(
            x, a, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=dot_prec)

    a1m, a2m, pmat = a1_ref[:], a2_ref[:], p_ref[:]
    b1 = vecs_ref[0, :][None, :]
    b2 = vecs_ref[1, :][None, :]
    q2 = vecs_ref[2, :][None, :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ga1_ref[:] = jnp.zeros_like(ga1_ref)
        ga2_ref[:] = jnp.zeros_like(ga2_ref)
        out_ref[:] = jnp.zeros_like(out_ref)

    h0r, h0f = h0r_ref[:], h0f_ref[:]
    eps = eps_ref[:, :1]
    h0i = eps * h0r + (1.0 - eps) * h0f
    bb = h0r.shape[0]

    # ONE forward chain over [real; fake; interp] stacked on the batch axis:
    # 1/3 the matmul count of per-input forwards, 3x-taller MXU operands
    h_all = jnp.concatenate([h0r, h0f, h0i], axis=0)      # [3B, 64]
    z1 = dot(h_all, a1m) + b1
    m1 = jnp.where(z1 > 0, f32(1.0), f32(slope))
    a1 = z1 * m1
    z2 = dot(a1, a2m) + b2
    m2 = jnp.where(z2 > 0, f32(1.0), f32(slope))
    a2 = z2 * m2

    # Wasserstein term: d(mean y_f - mean y_r)/dtheta, real+fake merged via
    # a per-row sign (rows < B are real with upstream -1/B)
    row = jax.lax.broadcasted_iota(jnp.int32, (2 * bb, 1), 0)
    dy = jnp.where(row < bb, f32(-inv_b), f32(inv_b))     # [2B, 1]
    dz2 = dy * q2 * m2[: 2 * bb]
    ga2_ref[:] += dotT(a1[: 2 * bb], dz2)
    gb2 = jnp.sum(dz2, axis=0, keepdims=True)
    dz1 = dotR(dz2, a2m) * m1[: 2 * bb]
    ga1_ref[:] += dotT(h_all[: 2 * bb], dz1)
    gb1 = jnp.sum(dz1, axis=0, keepdims=True)
    ap = dot(a2[: 2 * bb], pmat)                          # [2B, 16]
    gw = jnp.sum(dy * ap, axis=0, keepdims=True)

    # gradient penalty: second-order contributions (masks frozen a.e.)
    m1i, m2i = m1[2 * bb:], m2[2 * bb:]
    e2 = m2i * q2                                         # [B,64]
    e1 = m1i * dotR(e2, a2m)
    g = dotR(e1, a1m)                                     # dy/dh0 at interp
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    sel = (lane % 4) < 2                                  # candidate channels
    gc = jnp.where(sel, g, f32(0.0))
    n = jnp.sqrt(jnp.sum(gc * gc, axis=1, keepdims=True) + f32(1e-12))
    c = (f32(2.0 * gp_weight * inv_b) * (n - 1.0) / n) * gc
    c1 = dot(c, a1m) * m1i
    c2 = dot(c1, a2m)
    ga1_ref[:] += dotT(c, e1)
    ga2_ref[:] += dotT(c1, e2)
    gw += jnp.sum(dot(c2 * m2i, pmat), axis=0, keepdims=True)

    # metric sums: y means (bias added host-side), gp mean
    y_rf = jnp.sum(a2[: 2 * bb] * q2, axis=1, keepdims=True)  # [2B,1]
    y_r = y_rf[:bb]
    y_f = y_rf[bb:]
    gp = jnp.sum((n - 1.0) ** 2)

    # assemble the [8, 64] packed output without scatter (unsupported in
    # Mosaic): concatenate rows, place scalars via iota masks
    gw_row = jnp.concatenate([gw, jnp.zeros((1, 64 - PO), f32)], axis=1)
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    metrics_row = (jnp.where(lane64 == 0, jnp.sum(y_r), f32(0.0))
                   + jnp.where(lane64 == 1, jnp.sum(y_f), f32(0.0))
                   + jnp.where(lane64 == 2, gp, f32(0.0)))
    out_ref[:] += jnp.concatenate(
        [gb1, gb2, gw_row, metrics_row, jnp.zeros((4, 64), f32)], axis=0)


def critic_grad_pallas(
    params_d: Any,
    h0_real: jnp.ndarray,       # [B, 64] concat(clean, noisy) flattened
    h0_fake: jnp.ndarray,       # [B, 64] concat(fake, noisy) flattened
    eps: jnp.ndarray,           # [B] per-sample GP interpolation uniforms
    loss_cfg,
    leaky_slope: float = 0.2,
    block_rows: int = 1024,
    matmul_precision: str = "float32",
    interpret: bool = False,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Fused critic-loss gradient: returns (grads pytree, aux metrics) with
    the same semantics as value_and_grad of wgan_gp.critic_loss_fn."""
    b = h0_real.shape[0]
    mats = critic_dense_mats(params_d)
    vecs = jnp.zeros((8, 64), jnp.float32)
    vecs = vecs.at[0, :].set(mats["b1"]).at[1, :].set(mats["b2"])
    vecs = vecs.at[2, :].set(mats["q2"])

    tile = min(block_rows, b)
    while b % tile:
        tile //= 2
    grid = b // tile
    eps8 = jnp.broadcast_to(eps.astype(jnp.float32)[:, None], (b, 8))

    kernel = functools.partial(
        _kernel, slope=leaky_slope, gp_weight=float(loss_cfg.gp_weight),
        inv_b=1.0 / b, dot_prec=_PRECISION[matmul_precision],
    )
    ga1, ga2, out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((IN, H1), jnp.float32),
                   jax.ShapeDtypeStruct((H1, H2), jnp.float32),
                   jax.ShapeDtypeStruct((8, 64), jnp.float32)],
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, IN), lambda i: (i, 0)),
            pl.BlockSpec((tile, IN), lambda i: (i, 0)),
            pl.BlockSpec((tile, 8), lambda i: (i, 0)),
            pl.BlockSpec((IN, H1), lambda i: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i: (0, 0)),
            pl.BlockSpec((H2, PO), lambda i: (0, 0)),
            pl.BlockSpec((8, 64), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((IN, H1), lambda i: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i: (0, 0)),
            pl.BlockSpec((8, 64), lambda i: (0, 0)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 << 20),
    )(h0_real, h0_fake, eps8, mats["a1"], mats["a2"], mats["pmat"], vecs)

    grads = dense_grads_to_params(ga1, out[0], ga2, out[1], out[2], params_d)
    inv_b = 1.0 / b
    d_real_mean = out[3, 0] * inv_b + mats["bd"]
    d_fake_mean = out[3, 1] * inv_b + mats["bd"]
    gp = out[3, 2] * inv_b
    wasserstein = d_fake_mean - d_real_mean
    aux = {
        "d_loss": wasserstein + loss_cfg.gp_weight * gp,
        "wasserstein_distance": -wasserstein,
        "gradient_penalty": gp,
        "d_real_mean": d_real_mean,
        "d_fake_mean": d_fake_mean,
    }
    return grads, aux


def pack_h0(candidate: jnp.ndarray, condition: jnp.ndarray) -> jnp.ndarray:
    """``[B, 16, 2] x [B, 16, 2] -> [B, 64]`` critic input, matching the
    model's concat + row-major flatten (models/critic.py:41)."""
    return jnp.concatenate([candidate, condition], axis=-1).reshape(
        candidate.shape[0], -1)
