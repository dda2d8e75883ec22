"""Pipeline parallelism (``pp`` mesh axis): GPipe-style microbatch pipeline.

The third explicit multi-chip strategy next to shard_map dp (mesh.py) and
GSPMD dp/tp/sp (gspmd.py). No reference counterpart — the reference is
single-device torch (SURVEY.md §2.4) — and the construction is TPU-native:

  * the full U-Net splits into two stages along its natural seam
    (``FullUNetGenerator.encode`` = strided encoder | ``decode`` =
    bottleneck + decoder); the inter-stage payload is the skip pyramid
    (the bottleneck input IS the last skip, so the payload is exactly the
    skips, flattened into one static ``[mb, P]`` buffer);
  * the schedule is a ``lax.scan`` over ``M + S - 1`` ticks inside one
    ``shard_map`` over the ``pp`` axis: each tick, every device runs its
    stage (``lax.switch`` on ``axis_index``) and hands its activation to
    the next device with ``lax.ppermute`` — XLA lowers the ppermute onto
    the ICI ring;
  * the BACKWARD pipeline comes from ``jax.grad`` through that scan: the
    transpose of ``ppermute`` is the reverse permutation, so cotangents
    flow device-to-device in the mirrored schedule automatically — no
    hand-written backward pass, unlike the 1F1B/GPipe schedules CUDA
    frameworks implement by hand;
  * per-stage gradients (each device only differentiates its own switch
    branch) are summed with ``psum`` into the full replicated gradient,
    so the optimizer update is layout-invariant: the pipelined step must
    match the single-device supervised step to float tolerance
    (tests/test_pipeline.py, __graft_entry__.dryrun_multichip pp leg).

Scope: the supervised (``n_critic 0, adv_weight 0``) training path — the
full-scale champion recipe (results/RESULTS.md §Full 1024). Adversarial
training stays on dp/tp/sp: a critic's GP double-grad through a pipeline
buys nothing at this model scale, and U-Nets pipeline poorly anyway (the
skip payload is ~6x the bottleneck activation), which is why dp is the
recommended strategy and pp exists as a capability + a measured design
datum, not the default.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..signal.datagen import DatagenConfig, synthetic_batch
from .mesh import shard_map


def unet_stage_fns(gen, frame_length: int) -> Tuple[list, int]:
    """Build the two packed stage functions ``f(params, buf[mb,P]) -> buf``
    for a ``FullUNetGenerator`` and return ``(stages, P)``.

    The packed buffer layout: stage-0 input holds the flattened ``[L, 2]``
    noisy frame; the inter-stage payload holds the flattened skip pyramid
    (``skips[-1]`` is the bottleneck input); stage-1 output holds the
    flattened ``[L, 2]`` reconstruction. All three are padded to one static
    width ``P`` so the pipeline carry has a single shape.
    """
    L = frame_length
    widths = [gen.base_channels * (2 ** i) for i in range(gen.levels)]
    skip_shapes = [(L // (2 ** (i + 1)), widths[i]) for i in range(gen.levels)]
    sizes = [l * c for l, c in skip_shapes]
    payload = int(sum(sizes))
    io = L * 2
    width = max(payload, io)

    def _pad(flat):
        return jnp.pad(flat, ((0, 0), (0, width - flat.shape[1])))

    def stage_encode(params, buf):
        x = buf[:, :io].reshape(buf.shape[0], L, 2)
        _, skips = gen.apply(params, x, method="encode")
        return _pad(jnp.concatenate(
            [s.reshape(s.shape[0], -1) for s in skips], axis=1))

    def stage_decode(params, buf):
        skips, off = [], 0
        for (l, c), n in zip(skip_shapes, sizes):
            skips.append(buf[:, off:off + n].reshape(buf.shape[0], l, c))
            off += n
        y = gen.apply(params, skips[-1], skips, method="decode")
        return _pad(y.reshape(y.shape[0], -1))

    return [stage_encode, stage_decode], width


def _make_pp_spmd_fn(
    gen,
    tx: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    global_batch_size: int,
    microbatches: int,
    mesh: Mesh,
    remat: bool = False,
    grad_scale: float = 1.0,
) -> Callable:
    """Build the shard_mapped ``(params, opt_state, key) -> (params,
    opt_state, metrics)`` pipelined supervised update over the ``pp`` axis.

    ``grad_scale`` scales the assembled gradient before the optimizer update
    (exactly equivalent to optimizing ``grad_scale * L1`` — the loss is
    linear in its scale — so the product path can optimize the trainer's
    ``rec_weight * L1`` objective while metrics keep the raw L1).

    ``remat=True`` wraps each stage in ``jax.checkpoint`` — the GPipe
    activation-memory trade (recompute stage forwards during the backward
    schedule instead of holding every microbatch's residuals).
    """
    S = mesh.shape["pp"]
    M = microbatches
    L = dg_cfg.frame_length
    if global_batch_size % M:
        raise ValueError(f"global_batch_size {global_batch_size} not divisible "
                         f"by microbatches {M}")
    mb = global_batch_size // M
    stages, width = unet_stage_fns(gen, L)
    if len(stages) != S:
        raise ValueError(f"pp={S} but the U-Net splits into {len(stages)} "
                         f"stages (pp mesh axis must match)")
    if remat:
        stages = [jax.checkpoint(f) for f in stages]
    T = M + S - 1
    io = L * 2
    perm = [(i, (i + 1) % S) for i in range(S)]

    def spmd_step(params, opt_state, key):
        s = jax.lax.axis_index("pp")
        batch = synthetic_batch(key, global_batch_size, dg_cfg)
        noisy, clean = batch["noisy"], batch["clean"]

        def loss_fn(params):
            def tick(carry, t):
                recv, loss_acc = carry
                x_mb = jax.lax.dynamic_slice_in_dim(
                    noisy, jnp.clip(t, 0, M - 1) * mb, mb, axis=0)
                x_flat = jnp.pad(x_mb.reshape(mb, io),
                                 ((0, 0), (0, width - io)))
                inp = jnp.where(s == 0, x_flat, recv)
                out = jax.lax.switch(s, stages, params, inp)
                out_idx = t - (S - 1)
                c_mb = jax.lax.dynamic_slice_in_dim(
                    clean, jnp.clip(out_idx, 0, M - 1) * mb, mb, axis=0)
                y = out[:, :io].reshape(mb, L, 2)
                l_mb = jnp.mean(jnp.abs(y - c_mb))
                valid = (s == S - 1) & (out_idx >= 0)
                loss_acc = loss_acc + jnp.where(valid, l_mb / M, 0.0)
                recv_next = jax.lax.ppermute(out, "pp", perm)
                return (recv_next, loss_acc), None

            init = (jnp.zeros((mb, width), noisy.dtype), jnp.asarray(0.0, noisy.dtype))
            (_, loss_acc), _ = jax.lax.scan(tick, init, jnp.arange(T))
            # DEVICE-LOCAL loss (nonzero only on the last stage). The psum
            # that makes it global happens OUTSIDE the differentiated
            # function: psum's transpose is psum, so a psum inside loss_fn
            # would scale every cotangent by the pp size (observed as
            # exactly-2x gradients) on top of the cross-stage grads-psum
            # below.
            return loss_acc

        loss_local, grads = jax.value_and_grad(loss_fn)(params)
        # device s holds d loss / d (its stage's params), delivered by the
        # transposed ppermutes; the sum over the pp axis assembles the full
        # replicated gradient, and the same psum on the local loss yields
        # the global mean for metrics
        loss = jax.lax.psum(loss_local, "pp")
        grads = jax.lax.psum(grads, "pp")
        if grad_scale != 1.0:
            grads = jax.tree_util.tree_map(lambda g: grad_scale * g, grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, {"rec_loss": loss}

    return shard_map(
        spmd_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def make_pp_supervised_train_step(
    gen,
    tx: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    global_batch_size: int,
    microbatches: int,
    mesh: Mesh,
    remat: bool = False,
) -> Callable:
    """Build ``step((params, opt_state), key) -> ((params, opt_state), metrics)``
    — one pipelined supervised update (L1 reconstruction loss, the
    full-scale champion recipe) over the mesh's ``pp`` axis."""
    sharded = _make_pp_spmd_fn(gen, tx, dg_cfg, global_batch_size,
                               microbatches, mesh, remat=remat)

    @jax.jit
    def step(state, key):
        params, opt_state = state
        new_params, new_opt, metrics = sharded(params, opt_state, key)
        return (new_params, new_opt), metrics

    return step


def make_pp_trainstate_step(
    gen,
    tx_g: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg,
    global_batch_size: int,
    microbatches: int,
    mesh: Mesh,
    scan_steps: int = 1,
    remat: bool = False,
    donate: bool = True,
) -> Callable:
    """Product-path pipeline step: the trainer-compatible
    ``(TrainState, key) -> (TrainState, metrics)`` wrapper around the GPipe
    pipeline (``train.py --strategy pp``).

    Supervised-ONLY by design: a critic's GP double-grad through a pipeline
    buys nothing at this model scale and U-Nets pipeline poorly anyway (the
    skip payload is ~6x the bottleneck activation — docs/SCALING.md §pp), so
    adversarial configs raise loudly here instead of silently mistraining.

    Optimizes ``rec_weight * L1`` (the supervised fast-path objective of
    training/wgan_gp.generator_loss_fn), scans ``scan_steps`` outer steps
    per dispatch, and emits the full adversarial metric schema with zeroed
    critic entries — exactly like the single-device ``n_critic=0`` fast
    path — so trainer logging/JSONL schemas are unchanged.
    """
    if loss_cfg.n_critic != 0 or loss_cfg.adv_weight != 0.0:
        raise ValueError(
            "strategy='pp' trains the SUPERVISED path only (--n_critic 0 "
            "--adv_weight 0): adversarial WGAN-GP training is not pipelined "
            "— use --strategy shard_map (dp) or gspmd (dp/tp/sp) for GAN "
            f"recipes (got n_critic={loss_cfg.n_critic}, "
            f"adv_weight={loss_cfg.adv_weight})")
    sharded = _make_pp_spmd_fn(
        gen, tx_g, dg_cfg, global_batch_size, microbatches, mesh,
        remat=remat, grad_scale=float(loss_cfg.rec_weight))
    zero = jnp.zeros((), jnp.float32)

    def one_step(state, key):
        params_g, opt_g, metrics = sharded(state.params_g, state.opt_g, key)
        rec = metrics["rec_loss"]
        new_state = state.replace(params_g=params_g, opt_g=opt_g,
                                  step=state.step + 1)
        return new_state, {
            "d_loss": zero, "wasserstein_distance": zero,
            "gradient_penalty": zero, "d_real_mean": zero,
            "d_fake_mean": zero, "g_loss": loss_cfg.rec_weight * rec,
            "adv_loss": zero, "rec_loss": rec,
        }

    def step_fn(state, key):
        if scan_steps == 1:
            return one_step(state, key)
        keys = jax.random.split(key, scan_steps)

        def body(carry, k):
            st, _ = carry
            return one_step(st, k), None

        m0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(one_step, state, keys[0])[1])
        (state, metrics), _ = jax.lax.scan(body, (state, m0), keys)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
