"""Fully-fused CWGAN-GP training step: on-device datagen + n-critic + generator.

Behavioral parity target: reference train.py:201-368 (CWGANGPTrainer.
train_discriminator / train_generator / train_epoch):

  per outer step:
    batch = synthetic datagen                       <- fused on device here
    repeat n_critic times (same batch, like the reference train.py:331-334):
      fake   = G(noisy)          (stop-gradient)
      L_D    = E[D(fake,c)] - E[D(real,c)] + λ_gp·GP(real, fake, c)
      adam update on D
    L_G = -E[D(G(noisy),c)] + λ_rec·L1(G(noisy), clean)
    adam update on G

Everything — the OFDM datagen, the critic scan, the nested-grad gradient
penalty and both optimizer updates — lives inside ONE jitted computation, so
XLA fuses the whole step and no data ever touches the host. ``scan_steps``
lets callers run many outer steps per dispatch (lax.scan over steps) to
amortize launch overhead at small batch sizes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.critic import compute_gradient_penalty
from ..signal.datagen import DatagenConfig, synthetic_batch

_FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """WGAN-GP loss hyperparameters (reference config/config.yaml:75-82)."""

    n_critic: int = 5
    gp_weight: float = 10.0
    adv_weight: float = 1.0
    rec_weight: float = 100.0
    fresh_critic_batches: bool = False  # reference reuses one batch per outer step


class TrainState(struct.PyTreeNode):
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params_g, params_d, tx_g, tx_d):
        return cls(
            params_g=params_g,
            params_d=params_d,
            opt_g=tx_g.init(params_g),
            opt_d=tx_d.init(params_d),
            step=jnp.zeros((), jnp.int32),
        )


def critic_loss_fn(
    params_d,
    params_g,
    gen_apply: Callable,
    critic_apply: Callable,
    batch,
    key: jax.Array,
    cfg: LossConfig,
    gp_precision: str | None = None,
    critic_apply_gp: Callable | None = None,
    fuse_realfake: bool = False,
    gen_premap: Callable | None = None,
    critic_premap: Callable | None = None,
):
    """L_D = E[D(fake)] - E[D(real)] + λ·GP (train.py:219-253).

    ``gen_premap``/``critic_premap`` (models/flat.make_*_flat_parts): when
    given, the apply callables take PRE-EXPANDED dense matrices instead of
    the raw parameter tree, and this function expands each parameter value
    exactly ONCE — all apply sites (real/fake/interp + the GP chain) share
    one set of matrices, so the backward accumulates their cotangents into
    the matrices (MXU matmul transposes) and runs a single scatter-free
    band-sum transpose per matrix instead of a dynamic-update-slice chain
    per site (the round-3 op table's 9.3% DUS category,
    results/op_table_r3_headline.json).

    ``gp_precision`` raises the MXU matmul precision for JUST the
    gradient-penalty chain (forward + nested ∇ₓD + its parameter gradients —
    the context is active while this subgraph is traced, and transposed dots
    inherit the primal dot's precision), letting the rest of the critic step
    run at a cheaper precision (the "mixed" modes; see build_train_step).

    ``critic_apply_gp`` swaps the critic function for JUST the GP chain —
    used by the flat path to pin the GP dots to the explicit bf16x3
    decomposition (models/flat.tf32_matmul, whose custom_jvp keeps all
    derivative orders on the same 2-MXU-pass kernel) while the W-chain dots
    stay single-pass; same parameter tree, same function up to dot
    implementation. Takes precedence over ``gp_precision``."""
    noisy, clean = batch["noisy"], batch["clean"]
    if critic_premap is not None:
        params_d = critic_premap(params_d)  # expand ONCE; shared below
    gen_in = gen_premap(params_g) if gen_premap is not None else params_g
    # store the (non-differentiated) fake in the batch's storage dtype so a
    # bf16-storage step keeps every critic input half-width (no-op for f32)
    fake = jax.lax.stop_gradient(gen_apply(gen_in, noisy)).astype(noisy.dtype)
    if fuse_realfake:
        # one critic apply on the stacked [2B] candidates instead of two on
        # [B]: halves the W-chain's dot-issue count (each row's MXU
        # accumulation is independent, so per-example scores are identical;
        # the parameter gradient's batch reduction reassociates at ulp
        # level — same tolerance class as remat). The GP chain below stays
        # separate: its dots are pinned to a different implementation.
        n = clean.shape[0]
        d_all = critic_apply(params_d,
                             jnp.concatenate([clean, fake], 0),
                             jnp.concatenate([noisy, noisy], 0))
        d_real, d_fake = d_all[:n], d_all[n:]
    else:
        d_real = critic_apply(params_d, clean, noisy)
        d_fake = critic_apply(params_d, fake, noisy)
    wasserstein = jnp.mean(d_fake) - jnp.mean(d_real)
    if critic_apply_gp is not None:
        gp = compute_gradient_penalty(critic_apply_gp, params_d, clean, fake, noisy, key)
    elif gp_precision is None:
        gp = compute_gradient_penalty(critic_apply, params_d, clean, fake, noisy, key)
    else:
        with jax.default_matmul_precision(gp_precision):
            gp = compute_gradient_penalty(critic_apply, params_d, clean, fake, noisy, key)
    loss = wasserstein + cfg.gp_weight * gp
    aux = {
        "d_loss": loss,
        "wasserstein_distance": -wasserstein,
        "gradient_penalty": gp,
        "d_real_mean": jnp.mean(d_real),
        "d_fake_mean": jnp.mean(d_fake),
    }
    return loss, aux


def generator_loss_fn(
    params_g,
    params_d,
    gen_apply: Callable,
    critic_apply: Callable,
    batch,
    cfg: LossConfig,
    gen_premap: Callable | None = None,
    critic_premap: Callable | None = None,
):
    """L_G = -E[D(G(c),c)] + λ_rec·L1 (train.py:281-305).

    ``gen_premap``/``critic_premap``: expansion-once dense matrices — see
    ``critic_loss_fn``; the generator gradient then chains through ONE
    scatter-free expansion transpose.

    ``cfg.n_critic == 0`` is the SUPERVISED fast path: the critic forward is
    skipped entirely (adv ≡ 0). With ``adv_weight == 0`` this is bit-exact —
    the adv term's loss contribution is ``0.0 * finite = 0.0`` and autodiff
    scales the whole critic cotangent chain by that same 0.0, so the
    generator trajectory is IDENTICAL to an n_critic>0/adv_weight=0 run
    (tests/test_training.py::test_supervised_fast_path_bit_exact) while
    paying for none of the adversarial machinery."""
    noisy, clean = batch["noisy"], batch["clean"]
    gen_in = gen_premap(params_g) if gen_premap is not None else params_g
    fake = gen_apply(gen_in, noisy)
    if cfg.n_critic == 0:
        adv = jnp.zeros((), jnp.float32)
    else:
        d_in = critic_premap(params_d) if critic_premap is not None else params_d
        adv = -jnp.mean(critic_apply(d_in, fake, noisy))
    if clean.dtype in _FP8_DTYPES:
        # fp8 storage has no implicit promotion path; explicit upcast to the
        # generator output's dtype (what promotion does for bf16 storage)
        clean = clean.astype(fake.dtype)
    rec = jnp.mean(jnp.abs(fake - clean))
    loss = cfg.adv_weight * adv + cfg.rec_weight * rec
    aux = {"g_loss": loss, "adv_loss": adv, "rec_loss": rec}
    return loss, aux


def build_train_step(
    gen_apply: Callable,
    critic_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg: LossConfig,
    batch_size: int,
    scan_steps: int = 1,
    axis_name: str | None = None,
    matmul_precision: str = "float32",
    use_pallas_datagen: bool = False,
    batch_fn: Callable | None = None,
    use_pallas_critic: bool = False,
    critic_leaky_slope: float = 0.2,
    pallas_interpret: bool = False,
    act_dtype: str | None = None,
    critic_unroll: int = 1,
    critic_apply_gp: Callable | None = None,
    remat: bool = False,
    outer_unroll: int = 1,
    fuse_realfake: bool = False,
    gen_premap: Callable | None = None,
    critic_premap: Callable | None = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Build the (unjitted) fused outer step ``(state, key) -> (state, metrics)``.

    ``outer_unroll`` unrolls the outer ``scan_steps`` scan (pure codegen,
    identical numerics): adjacent training steps' datagen is data-independent,
    so unrolling exposes it to XLA's scheduler to overlap with the previous
    step's serial update chain — the right kind of lever for a step measured
    at ~2 µs/iteration on chip (op-issue-bound, results/r3_perf_queue.jsonl).

    ``remat=True`` wraps the generator/critic applies in ``jax.checkpoint``:
    backward passes recompute forward activations instead of loading them
    from HBM. Same stochastic function (equal up to fusion reassociation,
    ~4e-6; tests/test_flat_model.py), and the right trade for this step,
    which measures at ~93% of HBM speed-of-light with the MXU ~13% busy
    (results/perf_hlo_flat.json) — recompute FLOPs are free, saved
    intermediate traffic is not.

    ``use_pallas_critic`` swaps each critic update's value_and_grad for the
    hand-fused Pallas kernel (ops/pallas_critic.py) — the SAME stochastic
    function (the GP epsilons come from the identical jax.random stream),
    just computed in VMEM; exact parity is tested in
    tests/test_pallas_critic.py. Mini 16-sample architecture only.

    ``batch_fn(key, n) -> {"noisy", "clean", ...}`` overrides the synthetic
    datagen entirely (e.g. the image-backed dataset's ``sample_batch``).

    ``batch_size`` is per replica. When ``axis_name`` is given (shard_map
    data parallelism, see parallel/mesh.py) gradients and metrics are
    ``pmean``-reduced across the mesh axis before each optimizer update, so
    all replicas apply identical updates — the XLA-collective equivalent of
    a distributed all-reduce data-parallel step (SURVEY.md §2.4/§5.8).

    ``matmul_precision``: WGAN-GP training REQUIRES >= tensorfloat32 on TPU.
    With the MXU's default bf16-truncated matmuls the critic races ahead and
    the adversarial equilibrium collapses after ~1-2k steps (empirically
    reproduced across batch sizes/seeds; float32 runs track the CPU/torch
    reference dynamics exactly, and tensorfloat32 is validated stable over
    the full 500-epoch recipe — results/RESULTS.md §tf32). Two MIXED modes
    probe whether the collapse mechanism is the gradient-penalty chain's
    precision: "bf16_tf32gp" / "bf16_f32gp" run every matmul at bfloat16
    EXCEPT the GP subgraph (forward + nested ∇ₓD + its parameter gradients)
    at tensorfloat32 / float32 respectively.
    """
    if loss_cfg.n_critic == 0 and loss_cfg.adv_weight != 0.0:
        raise ValueError(
            "n_critic=0 (the supervised fast path) requires adv_weight=0 — "
            "with no critic updates an adversarial generator term would "
            "train against a frozen random critic")

    gp_precision = None
    if matmul_precision in ("bf16_tf32gp", "bf16_f32gp"):
        gp_precision = "tensorfloat32" if matmul_precision == "bf16_tf32gp" else "float32"
        matmul_precision = "bfloat16"
        if use_pallas_critic:
            raise ValueError("mixed GP precision is not supported by the "
                             "Pallas critic kernel path")

    if remat:
        gen_apply = jax.checkpoint(gen_apply)
        critic_apply = jax.checkpoint(critic_apply)
        if critic_apply_gp is not None:
            critic_apply_gp = jax.checkpoint(critic_apply_gp)

    def reduce_tree(t):
        if axis_name is None:
            return t
        return jax.lax.pmean(t, axis_name)

    if batch_fn is not None:
        gen_batch = batch_fn
    elif use_pallas_datagen:
        imp = dg_cfg.impairments
        if dg_cfg.channel.kind != "awgn" or (
            dg_cfg.nonlinear
            and (imp.pa_model != "rapp" or not imp.pa_enabled
                 or not imp.iq_enabled or not imp.phase_noise_enabled
                 or imp.dc_enabled or imp.cfo_enabled)
        ):
            raise ValueError(
                "pallas datagen kernel covers the AWGN channel with the "
                "default nonlinear chain (Rapp PA + IQ + phase noise); use "
                "the XLA path for other configurations"
            )
        from ..ops.pallas_datagen import synthetic_batch_pallas

        def gen_batch(k, n):
            return synthetic_batch_pallas(
                k, n, dg_cfg.snr_min, dg_cfg.snr_max,
                frame_length=dg_cfg.frame_length,
                nonlinear=dg_cfg.nonlinear,
                pa_saturation=imp.pa_saturation,
                pa_smoothness=imp.pa_smoothness,
                iq_amplitude_db=imp.iq_amplitude_db,
                iq_phase_deg=imp.iq_phase_deg,
                phase_noise_dbchz=imp.phase_noise_dbchz,
                sample_rate=imp.sample_rate,
            )
    else:
        def gen_batch(k, n):
            return synthetic_batch(k, n, dg_cfg)

    def one_step(state: TrainState, key: jax.Array):
        # 3-way split kept (third stream reserved) so existing run RNG
        # trajectories stay reproducible
        k_data, k_crit, _ = jax.random.split(key, 3)
        batch0 = gen_batch(k_data, batch_size)
        if act_dtype is not None:
            # bf16 STORAGE of the frame tensors: the step is HBM-bound
            # (results/perf_hlo_analysis.json), so halving the bytes of
            # every materialized [B, L, C] tensor and its cotangents is the
            # main throughput lever; matmuls still read f32 weights and
            # accumulate f32 (dense_conv), and the models must be built
            # with the same act_dtype so internal activations match.
            batch0 = dict(batch0)
            for k in ("noisy", "clean"):
                batch0[k] = batch0[k].astype(act_dtype)
        # (the whole body below is traced under the matmul-precision context
        # installed by the step_fn wrapper at the bottom of this builder)

        def critic_body(carry, k):
            params_d, opt_d = carry
            if loss_cfg.fresh_critic_batches:
                k_b, k_gp = jax.random.split(k)
                batch = gen_batch(k_b, batch_size)
            else:
                batch, k_gp = batch0, k
            if use_pallas_critic:
                from ..ops.pallas_critic import critic_grad_pallas, pack_h0

                noisy, clean = batch["noisy"], batch["clean"]
                fake = jax.lax.stop_gradient(gen_apply(state.params_g, noisy))
                # identical epsilon stream to compute_gradient_penalty
                eps = jax.random.uniform(
                    k_gp, (noisy.shape[0], 1, 1), noisy.dtype)[:, 0, 0]
                grads, aux = critic_grad_pallas(
                    params_d, pack_h0(clean, noisy), pack_h0(fake, noisy),
                    eps, loss_cfg, leaky_slope=critic_leaky_slope,
                    matmul_precision=matmul_precision,
                    interpret=pallas_interpret,
                )
            else:
                (loss, aux), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
                    params_d, state.params_g, gen_apply, critic_apply, batch, k_gp,
                    loss_cfg, gp_precision, critic_apply_gp, fuse_realfake,
                    gen_premap, critic_premap,
                )
            grads, aux = reduce_tree((grads, aux))
            updates, opt_d = tx_d.update(grads, opt_d, params_d)
            params_d = optax.apply_updates(params_d, updates)
            return (params_d, opt_d), aux

        if loss_cfg.n_critic == 0:
            # supervised fast path: no critic updates, no GP — the critic
            # tree rides through untouched and the adversarial metrics log
            # as zeros (keys kept so trainer logging/JSONL schemas match)
            params_d, opt_d = state.params_d, state.opt_d
            zero = jnp.zeros((), jnp.float32)
            d_aux = {"d_loss": zero, "wasserstein_distance": zero,
                     "gradient_penalty": zero, "d_real_mean": zero,
                     "d_fake_mean": zero}
        else:
            # unrolling the 5-iteration inner scan exposes cross-iteration ILP
            # to XLA's scheduler (identical numerics; scan unroll is pure codegen)
            (params_d, opt_d), d_auxes = jax.lax.scan(
                critic_body,
                (state.params_d, state.opt_d),
                jax.random.split(k_crit, loss_cfg.n_critic),
                unroll=critic_unroll,
            )
            # keep the last critic step's metrics, like the reference
            # (train.py:331-334 overwrites d_losses each inner iteration)
            d_aux = jax.tree_util.tree_map(lambda x: x[-1], d_auxes)

        (g_loss, g_aux), g_grads = jax.value_and_grad(generator_loss_fn, has_aux=True)(
            state.params_g, params_d, gen_apply, critic_apply, batch0, loss_cfg,
            gen_premap, critic_premap,
        )
        g_grads, g_aux = reduce_tree((g_grads, g_aux))
        updates, opt_g = tx_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)

        new_state = TrainState(
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            step=state.step + 1,
        )
        return new_state, {**d_aux, **g_aux}

    def step_fn(state: TrainState, key: jax.Array):
        with jax.default_matmul_precision(matmul_precision):
            if scan_steps == 1:
                return one_step(state, key)
            keys = jax.random.split(key, scan_steps)

            # only the LAST step's metrics are reported (reference
            # train.py prints the tail of each epoch's losses), so carry
            # them through the scan instead of stacking per-step ys —
            # stacking costs one dynamic-update-slice per metric per
            # iteration on an op-issue-bound step.
            def body(carry, k):
                st, _ = carry
                st, m = one_step(st, k)
                return (st, m), None

            m0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(one_step, state, keys[0])[1],
            )
            (state, metrics), _ = jax.lax.scan(body, (state, m0), keys,
                                               unroll=outer_unroll)
            return state, metrics

    return step_fn


def make_train_step(
    gen_apply: Callable,
    critic_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg: LossConfig,
    batch_size: int,
    scan_steps: int = 1,
    donate: bool = True,
    matmul_precision: str = "float32",
    use_pallas_datagen: bool = False,
    batch_fn: Callable | None = None,
    use_pallas_critic: bool = False,
    pallas_interpret: bool = False,
    act_dtype: str | None = None,
    critic_unroll: int = 1,
    critic_apply_gp: Callable | None = None,
    remat: bool = False,
    outer_unroll: int = 1,
    fuse_realfake: bool = False,
    gen_premap: Callable | None = None,
    critic_premap: Callable | None = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Single-device jitted fused train step (see ``build_train_step``)."""
    step_fn = build_train_step(
        gen_apply, critic_apply, tx_g, tx_d, dg_cfg, loss_cfg, batch_size,
        scan_steps, matmul_precision=matmul_precision,
        use_pallas_datagen=use_pallas_datagen, batch_fn=batch_fn,
        use_pallas_critic=use_pallas_critic, pallas_interpret=pallas_interpret,
        act_dtype=act_dtype, critic_unroll=critic_unroll,
        critic_apply_gp=critic_apply_gp, remat=remat,
        outer_unroll=outer_unroll, fuse_realfake=fuse_realfake,
        gen_premap=gen_premap, critic_premap=critic_premap,
    )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    gen_apply: Callable, dg_cfg: DatagenConfig, batch_size: int
) -> Callable[[Any, jax.Array], dict]:
    """Validation metrics on a fresh on-device batch (train.py:370-409)."""

    @jax.jit
    def eval_step(params_g, key):
        batch = synthetic_batch(key, batch_size, dg_cfg)
        fake = gen_apply(params_g, batch["noisy"])
        rec = jnp.mean(jnp.abs(fake - batch["clean"]))
        mse = jnp.mean((fake - batch["clean"]) ** 2)
        return {"rec_loss": rec, "mse": mse}

    return eval_step
