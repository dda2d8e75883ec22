"""Device mesh + shard_map data-parallel CWGAN-GP step.

This component has NO reference counterpart — the reference is single-device
(SURVEY.md §2.4: no DDP/NCCL anywhere) — and is designed TPU-first:

  * a ``jax.sharding.Mesh`` over the chip topology (ICI),
  * ``shard_map`` of the fused train step with explicit ``pmean`` gradient
    collectives over the ``dp`` axis (XLA lowers these onto the ICI rings),
  * deterministic per-device datagen: each replica folds its mesh coordinate
    into the PRNG key, so the global batch is a disjoint deterministic set
    of frames with no host data movement at all.

The same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for testing — the rebuild's
analog of the reference testing its hardware in iverilog instead of on a
real FPGA (SURVEY.md §4.5).
"""

from __future__ import annotations

import math
from typing import Callable, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..signal.datagen import DatagenConfig
from ..training.wgan_gp import LossConfig, TrainState, build_train_step

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(
    axis_sizes: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a named device mesh. Default: all devices on a single ``dp``
    axis. Pass e.g. ``{"dp": 4, "tp": 2}`` for a 2-D mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    dims = tuple(axis_sizes.values())
    n = math.prod(dims)
    if n > len(devices):
        raise ValueError(f"mesh {dict(axis_sizes)} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dims)
    return Mesh(arr, names)


def fold_device_key(key: jax.Array, axis_name: str = "dp") -> jax.Array:
    """Per-replica PRNG key: fold the mesh coordinate into the shared key
    (deterministic disjoint datagen shards — SURVEY.md §5.8)."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def make_sharded_train_step(
    gen_apply: Callable,
    critic_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    dg_cfg: DatagenConfig,
    loss_cfg: LossConfig,
    global_batch_size: int,
    mesh: Mesh,
    scan_steps: int = 1,
    donate: bool = True,
    matmul_precision: str = "float32",
    batch_fn: Optional[Callable] = None,
    act_dtype: Optional[str] = None,
    critic_unroll: int = 1,
    gen_premap: Optional[Callable] = None,
    critic_premap: Optional[Callable] = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """Data-parallel fused train step over ``mesh`` axis ``dp``.

    State is replicated; each replica generates ``global_batch // dp`` frames
    on-device from a folded key; gradients are ``pmean``-ed across ``dp``
    inside the step (before each of the n_critic critic updates and the
    generator update), so replicas stay bit-identical.

    ``batch_fn(key, n) -> batch`` overrides the synthetic datagen (e.g. the
    image-backed dataset's ``sample_batch``); its device-side caches are
    captured as replicated constants, and the folded per-replica keys give
    every device a disjoint (image, SNR) sample stream.
    """
    dp = mesh.shape["dp"]
    if global_batch_size % dp:
        raise ValueError(f"global batch {global_batch_size} not divisible by dp={dp}")
    per_device = global_batch_size // dp

    inner = build_train_step(
        gen_apply,
        critic_apply,
        tx_g,
        tx_d,
        dg_cfg,
        loss_cfg,
        per_device,
        scan_steps=scan_steps,
        axis_name="dp",
        matmul_precision=matmul_precision,
        batch_fn=batch_fn,
        act_dtype=act_dtype,
        critic_unroll=critic_unroll,
        gen_premap=gen_premap,
        critic_premap=critic_premap,
    )

    def per_replica(state: TrainState, key: jax.Array):
        return inner(state, fold_device_key(key, "dp"))

    # Over any extra mesh axes (e.g. a 'tp' axis reserved for the scaled
    # model family) the replicated args are simply broadcast.
    specs_in = (P(), P())
    specs_out = (P(), P())
    fn = shard_map(
        per_replica,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=specs_out,
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host-built TrainState replicated across the mesh (works for
    multi-process meshes too — every process passes the identical
    deterministically-initialized state)."""
    if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
        from .distributed import replicate_global

        return replicate_global(state, mesh)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)
