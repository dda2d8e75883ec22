"""Subprocess worker for tests/test_distributed.py.

Runs a few sharded CWGAN-GP train steps on a global dp mesh and prints a
parameter checksum. Invoked either as one of N distributed processes
(``--process_id i``) or as a single-process baseline (``--process_id -1``)
on the same global device count — the two must produce identical numbers
(lockstep), because per-device datagen keys fold the GLOBAL mesh coordinate
regardless of process layout (parallel/mesh.py:fold_device_key).
"""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:29873")
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--strategy", choices=["shard_map", "gspmd"], default="shard_map")
    args = p.parse_args()

    import jax

    if args.process_id < 0:  # single-process baseline on the full mesh
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices",
                          args.num_processes * args.local_devices)
    else:
        from ofdmgan_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id,
                   local_cpu_devices=args.local_devices)

    import numpy as np

    from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
    from ofdmgan_tpu.parallel import make_mesh, make_sharded_train_step, replicate_state
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import LossConfig, TrainState, make_adam

    n_global = args.num_processes * args.local_devices
    assert jax.device_count() == n_global, (jax.device_count(), n_global)

    key = jax.random.PRNGKey(0)
    tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)

    if args.strategy == "gspmd":
        # compiler-partitioned dp x tp over the multi-process mesh:
        # tensor-parallel full-U-Net kernels, GSPMD-inserted collectives
        from ofdmgan_tpu.models.full_unet import (
            FullDiscriminator, FullUNetGenerator, unet_param_shardings,
        )
        from ofdmgan_tpu.parallel import make_gspmd_train_step

        mesh = make_mesh({"dp": n_global // 2, "tp": 2})
        gen = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
        x0 = np.zeros((1, 64, 2), np.float32)
        make_state, step = make_gspmd_train_step(
            gen.apply, critic.apply, tx_g, tx_d,
            DatagenConfig.make(frame_length=64),
            LossConfig(n_critic=2),
            global_batch_size=2 * mesh.shape["dp"],
            mesh=mesh,
            gen_tp_rule=unet_param_shardings,
            donate=False,
        )
        state = make_state(gen.init(key, x0), critic.init(key, x0, x0))
    else:
        mesh = make_mesh({"dp": n_global})
        gen, critic = MiniGenerator(), MiniDiscriminator()
        x0 = np.zeros((1, 16, 2), np.float32)
        state = TrainState.create(gen.init(key, x0), critic.init(key, x0, x0),
                                  tx_g, tx_d)
        state = replicate_state(state, mesh)
        step = make_sharded_train_step(
            gen.apply, critic.apply, tx_g, tx_d,
            DatagenConfig.make(frame_length=16, snr_range=(0, 30)),
            LossConfig(n_critic=2),
            global_batch_size=4 * n_global,
            mesh=mesh,
            donate=False,
        )
    metrics = {}
    for i in range(args.steps):
        state, metrics = step(state, jax.random.fold_in(key, 100 + i))

    # checksum over every parameter of both nets, reduced INSIDE jit so it
    # works for tp-sharded multi-process params too (the jitted sum yields
    # a fully-replicated scalar every process can read)
    import jax.numpy as jnp

    @jax.jit
    def _checksum(pg, pd):
        leaves = jax.tree_util.tree_leaves((pg, pd))
        return sum(jnp.sum(l) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    checksum = float(jax.device_get(_checksum(state.params_g, state.params_d)))
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count() if args.process_id >= 0 else 1,
        "global_devices": jax.device_count(),
        "checksum": checksum,
        "d_loss": float(jax.device_get(metrics["d_loss"])),
        "g_loss": float(jax.device_get(metrics["g_loss"])),
        "step": int(jax.device_get(state.step)),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
