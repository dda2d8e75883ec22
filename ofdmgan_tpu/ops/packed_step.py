"""END-TO-END lane-packed CWGAN-GP training step.

Why this exists (the round-2 perf analysis, results/RESULTS.md §Perf):
the mini model's matmuls are ``[B, 32..64] x [32..64, 32..64]`` — they light
up at most (K·N)/128² ≈ 6–25% of the MXU systolic array, and every
materialized ``[B, 32/64]`` activation pads its minor dimension to the
TPU's 128-lane tile, wasting 2–4x of the HBM traffic that makes up the
34.6 ns/frame non-matmul floor. Round 2's per-layer lane-packing experiment
(ops/dense_conv.py:LANE_PACK) lost 20x to pack/unpack relayouts at every
layer boundary; its post-mortem prescribes the fix implemented here: carry
the packed layout END-TO-END — data is BORN packed in the datagen, every
model layer / gradient-penalty / loss op operates on ``[B/p, p·F]`` rows,
and nothing ever reshapes across the (8, 128) physical tile until the
scalar loss.

Layout contract: ``p`` frames per row. A packed tensor ``[R, p·L·C]``
(R = B/p) holds frame ``r·p + j`` in row ``r``, lanes ``[j·L·C, (j+1)·L·C)``,
flattened time-major/channel-minor exactly like the unpacked
``conv1d_via_matmul`` flattening — so every reshape used here only SPLITS
the minor dimension contiguously (``[R, p·F] -> [R, p, F]``), never
regroups rows.

Matmuls: ``y = x_packed @ kron(I_p, A)`` where ``A`` is the usual dense
conv matrix (ops/dense_conv.py). With p=4 the operands become
``[R, 128..256] x [128..256, 128..256]`` — full MXU tiles. A custom JVP
keeps autodiff from differentiating THROUGH the kron (the lesson of
ops/dense_conv._packed_matmul): the weight tangent/adjoint uses the
mathematically-equal block-sum einsum.

Numerical equivalence: the packed step computes the SAME function on the
SAME PRNG stream as training/wgan_gp.build_train_step (jax.random fills
row-major, so drawing ``[R, p, L]`` equals drawing ``[B, L]`` bit-for-bit);
only float reassociation inside the bigger matmuls differs. Exact-parity
tests: tests/test_packed_step.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.critic import MiniDiscriminator
from ..models.generator import MiniGenerator
from ..signal import channel as channel_lib
from ..signal import impairments as imp_lib
from ..signal.datagen import DatagenConfig
from ..signal.ofdm import ofdm_like_frame
from ..training.wgan_gp import LossConfig, TrainState
from .dense_conv import conv1d_dense_matrix, conv1d_output_length


# --------------------------------------------------------------- primitives
@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def pmatmul(xp: jnp.ndarray, a: jnp.ndarray, p: int, fin: int) -> jnp.ndarray:
    """Packed-resident matmul: ``[R, p·fin] @ kron(I_p, a) -> [R, p·fout]``.

    The custom JVP routes the ``a`` tangent around the kron: naive autodiff
    through ``jnp.kron`` materializes a [p·fin, p·fout] cotangent and
    gathers its diagonal blocks per layer per step (~20x slowdown measured
    in round 2). Built from linear primitives only, so reverse-over-reverse
    (the gradient penalty's second order) works.
    """
    a_bd = jnp.kron(jnp.eye(p, dtype=a.dtype), a)
    # accumulate in the promoted dtype (bf16 storage x f32 weights -> f32
    # products/accumulator, same rule as models/flat._mm)
    acc = jnp.promote_types(xp.dtype, a.dtype)
    return jnp.matmul(xp, a_bd, preferred_element_type=acc)


@pmatmul.defjvp
def _pmatmul_jvp(p, fin, primals, tangents):
    xp, a = primals
    dxp, da = tangents
    y = pmatmul(xp, a, p, fin)
    r = xp.shape[0]
    # block-sum form of x·da, kept on 3-D minor-split views (contiguous)
    x3 = xp.reshape(r, p, fin)
    acc = jnp.promote_types(xp.dtype, a.dtype)
    dy_a = jnp.einsum("rpf,fg->rpg", x3, da,
                      preferred_element_type=acc).reshape(r, -1)
    return y, pmatmul(dxp, a, p, fin) + dy_a


def _packed_conv(xp, w, b, l_in, stride, padding, p):
    """Packed conv layer: dense-matrix lowering + bias, packed-resident."""
    fin = l_in * w.shape[1]
    a = conv1d_dense_matrix(w, l_in, stride, padding)
    y = pmatmul(xp, a, p, fin)
    l_out = conv1d_output_length(l_in, w.shape[0], stride, padding)
    return y + jnp.tile(jnp.tile(b, l_out), p)


def _upsample2(xp, p, l, c):
    r = xp.shape[0]
    return jnp.repeat(xp.reshape(r, p, l, c), 2, axis=-2).reshape(r, -1)


# ------------------------------------------------------------------- models
def packed_gen_forward(params, xp: jnp.ndarray, p: int,
                       frame_length: int = 16,
                       leaky_slope: float = 0.2,
                       input_residual: bool = False,
                       act_dtype: str | None = None) -> jnp.ndarray:
    """MiniGenerator forward on packed rows ``[R, p·L·2]`` — numerically the
    conv1d_via_matmul lowering of models/generator.py with identical params.
    ``act_dtype`` stores each activation half-width (matmuls still read f32
    weights and accumulate f32), mirroring the module/flat act_dtype mode."""
    t = params.get("params", params)
    L = frame_length
    cast = (lambda a: a.astype(act_dtype)) if act_dtype else (lambda a: a)
    lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=leaky_slope)
    enc1 = cast(lrelu(_packed_conv(xp, t["enc1"]["conv_kernel"],
                                   t["enc1"]["conv_bias"], L, 2, 1, p)))
    bneck = cast(lrelu(_packed_conv(enc1, t["bottleneck"]["conv_kernel"],
                                    t["bottleneck"]["conv_bias"], L // 2, 2, 1, p)))
    up1 = _upsample2(bneck, p, L // 4, t["bottleneck"]["conv_kernel"].shape[2])
    dec1 = cast(lrelu(_packed_conv(up1, t["dec1"]["conv_kernel"],
                                   t["dec1"]["conv_bias"], L // 2, 1, 1, p)))
    skip = dec1 + enc1
    up2 = _upsample2(skip, p, L // 2, t["dec1"]["conv_kernel"].shape[2])
    out = _packed_conv(up2, t["out_conv_kernel"], t["out_conv_bias"], L, 1, 1, p)
    if input_residual:
        return xp.astype(out.dtype) + out
    return jnp.tanh(out)


def packed_critic_forward(params, cand: jnp.ndarray, cond: jnp.ndarray,
                          p: int, frame_length: int = 16,
                          leaky_slope: float = 0.2,
                          act_dtype: str | None = None) -> jnp.ndarray:
    """MiniDiscriminator forward on packed rows -> scores ``[R, p]``."""
    t = params.get("params", params)
    L = frame_length
    r = cand.shape[0]
    cast = (lambda a: a.astype(act_dtype)) if act_dtype else (lambda a: a)
    lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=leaky_slope)
    x = jnp.concatenate([cand.reshape(r, p, L, 2), cond.reshape(r, p, L, 2)],
                        axis=-1).reshape(r, -1)
    h = cast(lrelu(_packed_conv(x, t["conv1_kernel"], t["conv1_bias"], L, 2, 1, p)))
    h = lrelu(_packed_conv(h, t["conv2_kernel"], t["conv2_bias"], L // 2, 2, 1, p))
    c2 = t["conv2_kernel"].shape[2]
    pooled = jnp.sum(h.reshape(r, p, L // 4, c2), axis=-2).reshape(r, -1)
    k = t["dense"]["kernel"]  # [16, 1]
    scores = pmatmul(pooled, k, p, k.shape[0])
    return scores + t["dense"]["bias"][0]


# ------------------------------------------------------------------ datagen
def packed_synthetic_batch(key: jax.Array, batch_size: int, p: int,
                           cfg: DatagenConfig):
    """signal/datagen.synthetic_batch drawing the identical PRNG stream but
    with leading shape ``(B/p, p)``, returning packed rows directly — the
    datagen's final fusion WRITES the packed layout, so no relayout exists
    between datagen and the first matmul."""
    l = cfg.frame_length
    r = batch_size // p
    k_sym, k_imp, k_snr, k_ch = jax.random.split(key, 4)
    kr, ki = jax.random.split(k_sym)
    freq = (
        jax.random.normal(kr, (r, p, l), jnp.float32)
        + 1j * jax.random.normal(ki, (r, p, l), jnp.float32)
    ) / jnp.sqrt(2.0)
    clean = ofdm_like_frame(freq)
    distorted = clean
    if cfg.nonlinear:
        distorted = imp_lib.apply_all(k_imp, clean, cfg.impairments)
    snr = jax.random.uniform(k_snr, (r, p), jnp.float32, cfg.snr_min, cfg.snr_max)
    noisy, _ = channel_lib.apply(k_ch, distorted, snr, cfg.channel)

    noisy_iq = jnp.stack([noisy.real, noisy.imag], -1).astype(jnp.float32)
    clean_iq = jnp.stack([clean.real, clean.imag], -1).astype(jnp.float32)
    # per-frame joint max-abs normalization (axes: time, I/Q)
    m = jnp.maximum(
        jnp.max(jnp.abs(noisy_iq), axis=(-2, -1), keepdims=True),
        jnp.max(jnp.abs(clean_iq), axis=(-2, -1), keepdims=True),
    )
    m = jnp.maximum(m, 1e-12)
    return {
        "noisy": (noisy_iq / m).reshape(r, p * l * 2),
        "clean": (clean_iq / m).reshape(r, p * l * 2),
        "snr": snr,
    }


# --------------------------------------------------------------------- step
def packed_gradient_penalty(params_d, real, fake, cond, key, p, frame_length,
                            act_dtype=None):
    """compute_gradient_penalty on packed rows — same per-frame epsilon
    stream (uniform fills row-major), same norm semantics. Alpha is drawn
    f32 and the interpolant cast to the inputs' STORAGE dtype, mirroring
    models/critic.compute_gradient_penalty's bf16-storage semantics."""
    r = real.shape[0]
    alpha = jax.random.uniform(key, (r, p, 1), jnp.float32)
    x3 = real.reshape(r, p, -1)
    f3 = fake.reshape(r, p, -1)
    interp = (alpha * x3 + (1.0 - alpha) * f3).astype(real.dtype).reshape(r, -1)

    def score_sum(x):
        return jnp.sum(packed_critic_forward(params_d, x, cond, p, frame_length,
                                             act_dtype=act_dtype))

    grads = jax.grad(score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(r, p, -1) ** 2, axis=-1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def build_packed_train_step(
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg: LossConfig,
    batch_size: int,
    p: int = 4,
    scan_steps: int = 1,
    matmul_precision: str = "tensorfloat32",
    leaky_slope: float = 0.2,
    input_residual: bool = False,
    act_dtype: str | None = None,
    critic_unroll: int = 1,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Packed equivalent of training/wgan_gp.build_train_step (reference
    recipe semantics: n_critic updates on one batch, nested-grad GP,
    Adam(0, 0.9)); same TrainState / param trees / PRNG stream.

    ``act_dtype``/``critic_unroll``/mixed ``matmul_precision`` mirror
    build_train_step so every headline configuration is also benchable in
    the packed layout (bench.py --packed)."""
    assert batch_size % p == 0, (batch_size, p)
    L = dg_cfg.frame_length

    gp_precision = None
    if matmul_precision in ("bf16_tf32gp", "bf16_f32gp"):
        gp_precision = ("tensorfloat32" if matmul_precision == "bf16_tf32gp"
                        else "float32")
        matmul_precision = "bfloat16"

    gen_fwd = functools.partial(packed_gen_forward, p=p, frame_length=L,
                                leaky_slope=leaky_slope,
                                input_residual=input_residual,
                                act_dtype=act_dtype)
    critic_fwd = functools.partial(packed_critic_forward, p=p, frame_length=L,
                                   leaky_slope=leaky_slope,
                                   act_dtype=act_dtype)

    def critic_loss(params_d, params_g, batch, k_gp):
        noisy, clean = batch["noisy"], batch["clean"]
        fake = jax.lax.stop_gradient(gen_fwd(params_g, noisy)).astype(noisy.dtype)
        d_real = critic_fwd(params_d, clean, noisy)
        d_fake = critic_fwd(params_d, fake, noisy)
        wasserstein = jnp.mean(d_fake) - jnp.mean(d_real)
        if gp_precision is None:
            gp = packed_gradient_penalty(params_d, clean, fake, noisy, k_gp,
                                         p, L, act_dtype)
        else:
            with jax.default_matmul_precision(gp_precision):
                gp = packed_gradient_penalty(params_d, clean, fake, noisy,
                                             k_gp, p, L, act_dtype)
        loss = wasserstein + loss_cfg.gp_weight * gp
        return loss, {
            "d_loss": loss,
            "wasserstein_distance": -wasserstein,
            "gradient_penalty": gp,
            "d_real_mean": jnp.mean(d_real),
            "d_fake_mean": jnp.mean(d_fake),
        }

    def gen_loss(params_g, params_d, batch):
        noisy, clean = batch["noisy"], batch["clean"]
        fake = gen_fwd(params_g, noisy)
        adv = -jnp.mean(critic_fwd(params_d, fake, noisy))
        rec = jnp.mean(jnp.abs(fake - clean))
        loss = loss_cfg.adv_weight * adv + loss_cfg.rec_weight * rec
        return loss, {"g_loss": loss, "adv_loss": adv, "rec_loss": rec}

    def one_step(state: TrainState, key: jax.Array):
        k_data, k_crit, _ = jax.random.split(key, 3)
        batch0 = packed_synthetic_batch(k_data, batch_size, p, dg_cfg)
        if act_dtype is not None:
            batch0 = dict(batch0)
            for kk in ("noisy", "clean"):
                batch0[kk] = batch0[kk].astype(act_dtype)

        def critic_body(carry, k):
            params_d, opt_d = carry
            (loss, aux), grads = jax.value_and_grad(critic_loss, has_aux=True)(
                params_d, state.params_g, batch0, k)
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            params_d = optax.apply_updates(params_d, updates)
            return (params_d, opt_d), aux

        (params_d, opt_d), d_auxes = jax.lax.scan(
            critic_body,
            (state.params_d, state.opt_d),
            jax.random.split(k_crit, loss_cfg.n_critic),
            unroll=critic_unroll,
        )
        d_aux = jax.tree_util.tree_map(lambda x: x[-1], d_auxes)

        (g_l, g_aux), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
            state.params_g, params_d, batch0)
        updates, opt_g = tx_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)

        new_state = TrainState(params_g=params_g, params_d=params_d,
                               opt_g=opt_g, opt_d=opt_d, step=state.step + 1)
        return new_state, {**d_aux, **g_aux}

    def step_fn(state: TrainState, key: jax.Array):
        with jax.default_matmul_precision(matmul_precision):
            if scan_steps == 1:
                return one_step(state, key)
            keys = jax.random.split(key, scan_steps)
            state, metrics = jax.lax.scan(one_step, state, keys)
            return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return step_fn


def make_packed_train_step(*args, donate: bool = True, **kw):
    step = build_packed_train_step(*args, **kw)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
