"""Multi-process distributed runtime: `jax.distributed` wiring.

This is the framework's distributed communication backend (SURVEY.md §5.8;
the reference has NO counterpart — it is single-process, train.py:102).
Design, TPU-first:

  * ``initialize()`` wraps ``jax.distributed.initialize``: one JAX process
    per host (or per test subprocess), a coordinator service on process 0,
    and a GLOBAL device view — after it returns, ``jax.devices()`` spans
    every process and a ``Mesh`` built from it rides ICI within a slice and
    DCN across slices. All cross-device communication is XLA collectives
    (``psum``/``pmean`` inside shard_map, GSPMD-inserted all-reduces) — the
    role NCCL/MPI plays elsewhere.
  * ``replicate_global()`` places a host-built pytree replicated over a
    (possibly multi-process) mesh via ``jax.make_array_from_callback`` —
    every process must hold the same host value (same PRNG seed), which the
    deterministic init discipline guarantees.
  * The per-device datagen keys fold the GLOBAL mesh coordinate
    (mesh.py:fold_device_key uses ``lax.axis_index``), so a multi-process
    run consumes exactly the same frame stream as a single-process run on
    the same mesh shape — lockstep-testable (tests/test_distributed.py).

Testing without a pod follows the repo's hardware-free discipline
(SURVEY.md §4 implication iii): N subprocesses × M virtual CPU devices.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_cpu_devices: Optional[int] = None,
) -> None:
    """Join (or start, for process 0) the distributed runtime.

    Must run before any other JAX use in the process. With no arguments,
    jax auto-detects cluster environment variables (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc.). ``local_cpu_devices`` forces this
    process onto a virtual CPU backend with that many devices first —
    the multi-process-without-a-pod test configuration.
    """
    if local_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def is_initialized() -> bool:
    return jax.process_count() > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS") is not None


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Replicate a host-built pytree over ``mesh``, multi-process safe.

    Every process must pass an identical ``tree`` (same seed / same
    deterministic init). Unlike ``jax.device_put``, this works when the
    mesh spans devices this process cannot address.
    """
    sharding = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(place, tree)


def process_local_scalar(x) -> float:
    """Fetch a fully-replicated global scalar on this process."""
    arr = np.asarray(jax.experimental.multihost_utils.process_allgather(x)) \
        if not getattr(x.sharding, "is_fully_replicated", True) else x
    return float(np.asarray(arr).reshape(-1)[0])
