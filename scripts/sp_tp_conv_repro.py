#!/usr/bin/env python3
"""Minimal self-contained reproducer of the XLA SPMD conv miscompiles that
constrain this framework's sequence-parallel support (upstream-filing
artifact; jax 0.9.0).

Two distinct wrong-VALUES-no-error failure modes of
`lax.conv_general_dilated` under GSPMD partitioning with a
spatially-sharded LHS (mesh axis `sp` over the W dim):

  1. FORWARD, column-parallel: kernel sharded on C_out -> wrong outputs.
     (The Megatron column half of a tp rule.)
  2. BACKWARD, any kernel sharding INCLUDING fully replicated: when the
     partitioner keeps the gradient convs spatially partitioned, grad wrt
     the KERNEL (and for sharded kernels also grad wrt the input) is
     wrong. Row-parallel (C_in-sharded) kernels are correct in forward
     but their input-cotangent conv transposes into the C_out-sharded
     pattern of (1), so TRAINING is broken for both tp forms under sp.

Consequences in ofdmgan_tpu (all evidence-based on this script +
tests/test_gspmd.py):

  * sp x tp training is guarded OFF (parallel/gspmd.py `_guard_sp_tp`
    rejects any tp-sharded conv kernel when the mesh has an sp axis);
  * the row-parallel rule (models/full_unet.unet_param_shardings_
    rowparallel) remains available for INFERENCE sharding only;
  * dp x sp training (replicated kernels) is accepted because the
    compiled product training step is verified value-equivalent to the
    pure-dp layout (tests/test_gspmd.py::test_full_unet_dp_sp_layout_
    equivalence, __graft_entry__.dryrun_multichip) — the partitioner
    compiles those programs correctly; this script's case (2) shows that
    property must be TESTED per program, not assumed.

Run: python scripts/sp_tp_conv_repro.py   (any platform; forces an
8-device virtual CPU mesh, so no TPU needed to reproduce).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def conv(h, w):
    return jax.lax.conv_general_dilated(
        h, w, (1,), ((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"))


def main() -> int:
    print(f"jax {jax.__version__}, {len(jax.devices())} "
          f"{jax.devices()[0].platform} devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("dp", "sp", "tp"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64, 8)), jnp.float32)   # [N, W, C_in]
    k = jnp.asarray(rng.normal(size=(3, 8, 16)), jnp.float32)   # [w, C_in, C_out]

    def loss(h, w):
        return jnp.sum(jnp.sin(conv(h, w)))

    y_ref = jax.jit(conv)(x, k)
    gx_ref, gw_ref = jax.jit(jax.grad(loss, (0, 1)))(x, k)

    def put(sx, sk):
        return (jax.device_put(x, NamedSharding(mesh, sx)),
                jax.device_put(k, NamedSharding(mesh, sk)))

    cases = {
        "column-parallel: k P(-,-,tp)": P(None, None, "tp"),
        "row-parallel:    k P(-,tp,-)": P(None, "tp", None),
        "replicated:      k P(-,-,-)": P(None, None, None),
    }
    bad = 0
    for name, sk in cases.items():
        xs, ks = put(P("dp", "sp", None), sk)
        dy = float(jnp.max(jnp.abs(jax.jit(conv)(xs, ks) - y_ref)))
        gx, gw = jax.jit(jax.grad(loss, (0, 1)))(xs, ks)
        dgx = float(jnp.max(jnp.abs(gx - gx_ref)))
        dgw = float(jnp.max(jnp.abs(gw - gw_ref)))
        ok = max(dy, dgx, dgw) < 1e-3
        bad += not ok
        print(f"  LHS P(dp,sp,-) {name:30s} fwd={dy:9.3e} "
              f"d(grad_x)={dgx:9.3e} d(grad_w)={dgw:9.3e}  "
              f"{'OK' if ok else 'MISCOMPILE (wrong values, no error)'}")
    # control: no sp sharding — everything agrees
    xs, ks = put(P("dp", None, None), P(None, "tp", None))
    gx, gw = jax.jit(jax.grad(loss, (0, 1)))(xs, ks)
    print(f"  control LHS P(dp,-,-) k P(-,tp,-) [no sp]       "
          f"d(grad_w)={float(jnp.max(jnp.abs(gw - gw_ref))):9.3e}  OK")
    if bad == 0:
        print("All combinations agree — the upstream miscompiles are FIXED: "
              "lift the guard in parallel/gspmd.py and delete the canary "
              "tests in tests/test_gspmd.py.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
