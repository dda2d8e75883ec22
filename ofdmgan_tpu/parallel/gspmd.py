"""GSPMD (pjit) training: compiler-partitioned dp x tp CWGAN-GP step.

The second of the framework's two multi-chip strategies (SURVEY.md §2.4):

  * ``parallel/mesh.py`` — explicit shard_map data parallelism (manual
    pmean collectives, per-device datagen keys);
  * this module — jit + shardings (the pjit style): parameters carry
    NamedShardings (tensor-parallel for the full U-Net via
    ``models/full_unet.unet_param_shardings``), optimizer state inherits
    them by sharding propagation, the on-device data batch is constrained
    to the ``dp`` axis, and XLA GSPMD inserts every collective (gradient
    all-reduce across dp, all-gathers/reduce-scatters for the
    tp-partitioned matmuls) automatically.

Use GSPMD when the model is large enough to shard (the 1024-sample U-Net
family); use shard_map when you want explicit, auditable collectives (the
mini model's pure-dp training).

Mesh axes understood by this module:

  * ``dp`` — batch sharding (always),
  * ``tp`` — Megatron channel sharding of the U-Net kernels via
    ``gen_tp_rule=unet_param_shardings``,
  * ``sp`` — sequence parallelism: the frame-length axis of every
    [B, L, 2] activation sharded across devices, conv halo exchanges
    inserted by GSPMD's spatial partitioner (useful when L is too long
    for one chip's VMEM/HBM, e.g. very long OFDM captures). dp x sp is
    layout-equivalent to pure dp (tested); sp x tp is supported with
    the ROW-parallel kernel rule
    (models/full_unet.unet_param_shardings_rowparallel) — COLUMN-
    parallel (C_out-sharded) kernels are guarded off under sp due to
    an XLA partitioner miscompile (see the canary test and
    scripts/sp_tp_conv_repro.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..signal.datagen import DatagenConfig
from ..training.wgan_gp import LossConfig, TrainState, build_train_step


def make_gspmd_train_step(
    gen_apply: Callable,
    critic_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg: LossConfig,
    global_batch_size: int,
    mesh: Mesh,
    gen_tp_rule: Callable | None = None,
    critic_tp_rule: Callable | None = None,
    scan_steps: int = 1,
    matmul_precision: str = "float32",
    donate: bool = True,
    batch_fn: Callable | None = None,
    act_dtype: str | None = None,
    critic_unroll: int = 1,
    critic_apply_gp: Callable | None = None,
    fuse_realfake: bool = False,
) -> Tuple[Callable, Callable]:
    """Build ``(make_state, step)``.

    ``make_state(params_g, params_d) -> TrainState`` places the params under
    the tensor-parallel rules (None = replicated) and initializes optimizer
    state ON the mesh so its leaves inherit the parameter shardings by
    propagation. ``step(state, key)`` is a plain ``jax.jit`` — it picks up
    the shardings committed on the state and lets GSPMD partition the whole
    fused train step; the generated batch is constrained to ``P('dp', ...)``.
    """
    replicated = NamedSharding(mesh, P())
    # Sequence parallelism: when the mesh carries an ``sp`` axis, the frame
    # LENGTH dimension of every [B, L, 2] activation is sharded across it.
    # The U-Net is a conv stack (lax.conv_general_dilated, k=3), so GSPMD's
    # spatial partitioner inserts the kernel//2-sample halo exchanges at the
    # shard boundaries automatically — the TPU-native equivalent of the
    # manual ring halo a CUDA framework would hand-write. It composes with
    # dp (batch) sharding on the same mesh; the global function is
    # unchanged, only the inserted collectives differ (layout equivalence
    # asserted in __graft_entry__.dryrun_multichip and tests/test_gspmd.py).
    sp = "sp" if mesh.shape.get("sp", 1) > 1 else None

    def _guard_sp_tp(shardings):
        # jax 0.9.0 / XLA SPMD miscompiles spatially-partitioned convs with
        # tp-sharded kernels — wrong VALUES, no error (full empirical map +
        # upstream-filing reproducer: scripts/sp_tp_conv_repro.py; canaries:
        # tests/test_gspmd.py::test_sp_tp_conv_partitioner_canary /
        # test_sp_conv_weight_grad_canary — if they report the upstream
        # fix, delete this guard). COLUMN-parallel (C_out-sharded) kernels
        # fail in FORWARD; ROW-parallel (C_in-sharded) kernels are correct
        # forward but their input-cotangent conv transposes into the
        # C_out-sharded pattern, so TRAINING is broken for both tp forms.
        # This is a training builder, hence: no tp-sharded conv kernel of
        # any form while the mesh has an sp axis. (Replicated-kernel dp x
        # sp training is accepted — its value equivalence to pure dp is
        # asserted per-program by tests and the dryrun.)
        if not sp:
            return
        for s in jax.tree_util.tree_leaves(
                shardings, is_leaf=lambda x: isinstance(x, NamedSharding)):
            spec = getattr(s, "spec", None)
            if spec and len(spec) >= 3 and any(a is not None for a in spec):
                raise ValueError(
                    "sp x tp training is disabled: XLA's SPMD partitioner "
                    "miscompiles spatially-sharded convs with tp-sharded "
                    "kernels (column-parallel in forward; row-parallel in "
                    f"backward) — kernel spec {spec} under an sp mesh. See "
                    "scripts/sp_tp_conv_repro.py and docs/SCALING.md. Use "
                    "dp x sp or dp x tp; the row-parallel rule is safe for "
                    "inference-only sharding.")

    user_batch_fn = batch_fn

    def sharded_batch_fn(key, n):
        # GSPMD data path: one global key (unlike shard_map's per-device
        # fold_in), tensors constrained onto the dp (and sp) axes — XLA
        # partitions the datagen itself
        if user_batch_fn is not None:
            batch = user_batch_fn(key, n)
        else:
            from ..signal.datagen import synthetic_batch

            batch = synthetic_batch(key, n, dg_cfg)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x,
                NamedSharding(mesh, P("dp", sp, None) if x.ndim == 3 else P("dp")),
            ),
            batch,
        )

    inner = build_train_step(
        gen_apply, critic_apply, tx_g, tx_d, dg_cfg, loss_cfg,
        global_batch_size, scan_steps=scan_steps, batch_fn=sharded_batch_fn,
        matmul_precision=matmul_precision, act_dtype=act_dtype,
        critic_unroll=critic_unroll, critic_apply_gp=critic_apply_gp,
        fuse_realfake=fuse_realfake,
    )

    def _put(tree, shardings):
        """Place host values under shardings; multi-process meshes need
        make_array_from_callback (device_put can't target non-addressable
        devices)."""
        if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
            import numpy as np

            return jax.tree_util.tree_map(
                lambda x, s: jax.make_array_from_callback(
                    np.shape(x), s, lambda idx, x=np.asarray(x): x[idx]),
                tree, shardings,
            )
        return jax.device_put(tree, shardings)

    def _place(params, rule):
        sh = (rule(params, mesh) if rule is not None
              else jax.tree_util.tree_map(lambda _: replicated, params))
        _guard_sp_tp(sh)
        return _put(params, sh)

    def _opt_on_mesh(tx, params, rule):
        """Optimizer state with adam moments sharded like their params
        (optax.tree_map_params maps over the params-like subtrees of the
        state; everything else — counts — replicates)."""
        sh = (rule(params, mesh) if rule is not None
              else jax.tree_util.tree_map(lambda _: replicated, params))
        state = tx.init(jax.device_get(params))
        state_sh = optax.tree_map_params(
            tx, lambda _leaf, s: s, state, sh,
            transform_non_params=lambda _leaf: replicated,
        )
        return _put(state, state_sh)

    def make_state(params_g, params_d) -> TrainState:
        opt_g = _opt_on_mesh(tx_g, params_g, gen_tp_rule)
        opt_d = _opt_on_mesh(tx_d, params_d, critic_tp_rule)
        params_g = _place(params_g, gen_tp_rule)
        params_d = _place(params_d, critic_tp_rule)
        import jax.numpy as jnp

        step0 = _put(jnp.zeros((), jnp.int32), replicated)
        return TrainState(params_g=params_g, params_d=params_d,
                          opt_g=opt_g, opt_d=opt_d, step=step0)

    step = jax.jit(inner, donate_argnums=(0,) if donate else ())
    return make_state, step
