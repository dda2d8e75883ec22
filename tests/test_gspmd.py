"""GSPMD (pjit-style) sharded training tests on the virtual 8-device mesh:
full U-Net dp x tp train step compiles, executes, keeps params sharded, and
matches single-device numerics for the mini model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.full_unet import (
    FullDiscriminator, FullUNetGenerator, unet_param_shardings,
)
from ofdmgan_tpu.parallel import make_mesh
from ofdmgan_tpu.parallel.gspmd import make_gspmd_train_step
from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.training import LossConfig, make_adam

KEY = jax.random.PRNGKey(0)


class TestGSPMD:
    def test_full_unet_dp_tp_train_step(self):
        mesh = make_mesh({"dp": 4, "tp": 2})
        gen = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
        x0 = jnp.zeros((1, 64, 2))
        pg = gen.init(KEY, x0)
        pd = critic.init(KEY, x0, x0)
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
        make_state, step = make_gspmd_train_step(
            gen.apply, critic.apply, tx_g, tx_d,
            DatagenConfig.make(frame_length=64),
            LossConfig(n_critic=2),
            global_batch_size=16, mesh=mesh,
            gen_tp_rule=unet_param_shardings, donate=False,
        )
        state = make_state(pg, pd)
        # params actually tp-sharded
        import flax

        specs = flax.traverse_util.flatten_dict(
            jax.tree_util.tree_map(lambda a: a.sharding.spec, state.params_g)["params"]
        )
        assert any("tp" in str(s) for s in specs.values())
        # optimizer moments inherited the shardings
        mu_leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a: str(a.sharding.spec), state.opt_g)
        )
        assert any("tp" in s for s in mu_leaves)

        new_state, metrics = step(state, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state)
        assert int(jax.device_get(new_state.step)) == 1
        for k in ("d_loss", "g_loss", "rec_loss"):
            assert np.isfinite(float(jax.device_get(metrics[k]))), k
        # params remain sharded after the update
        specs2 = flax.traverse_util.flatten_dict(
            jax.tree_util.tree_map(lambda a: a.sharding.spec, new_state.params_g)["params"]
        )
        assert any("tp" in str(s) for s in specs2.values())

    def test_full_unet_dp_sp_layout_equivalence(self):
        # Sequence parallelism: sharding the frame-length axis over an `sp`
        # mesh axis (GSPMD inserts the conv halo exchanges) must train to
        # the same parameters as the pure-dp layout — same global function,
        # different collectives.
        gen = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
        x0 = jnp.zeros((1, 64, 2))
        pg, pd = gen.init(KEY, x0), critic.init(KEY, x0, x0)

        def checksum(tree):
            return float(sum(jnp.sum(l) for l in
                             jax.tree_util.tree_leaves(jax.device_get(tree))))

        sums = []
        for layout in ({"dp": 8}, {"dp": 4, "sp": 2}):
            mesh = make_mesh(layout)
            make_state, step = make_gspmd_train_step(
                gen.apply, critic.apply, make_adam(1e-4), make_adam(1e-4),
                DatagenConfig.make(frame_length=64), LossConfig(n_critic=1),
                global_batch_size=16, mesh=mesh, donate=False,
            )
            st, m = step(make_state(pg, pd), jax.random.PRNGKey(2))
            jax.block_until_ready(st)
            assert np.isfinite(float(jax.device_get(m["g_loss"])))
            sums.append(checksum((st.params_g, st.params_d)))
        rel = abs(sums[0] - sums[1]) / max(1e-12, abs(sums[0]))
        assert rel < 1e-6, (sums, rel)

    def test_sp_tp_guard_rejects_tp_kernels(self):
        # tp-sharded kernels under sp hit the XLA miscompile in forward
        # (column-parallel) or backward (row-parallel) — the canaries below
        # — so placing EITHER rule on an sp mesh must raise; the guard
        # fires on the actual shardings at make_state time.
        from ofdmgan_tpu.models.full_unet import unet_param_shardings_rowparallel

        gen = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
        x0 = jnp.zeros((1, 64, 2))
        pg, pd = gen.init(KEY, x0), critic.init(KEY, x0, x0)
        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        for rule in (unet_param_shardings, unet_param_shardings_rowparallel):
            make_state, _ = make_gspmd_train_step(
                gen.apply, critic.apply, make_adam(1e-4), make_adam(1e-4),
                DatagenConfig.make(frame_length=64), LossConfig(n_critic=1),
                global_batch_size=16, mesh=mesh,
                gen_tp_rule=rule, donate=False,
            )
            with pytest.raises(ValueError, match="sp x tp"):
                make_state(pg, pd)

    def test_sp_tp_rowparallel_forward_inference_ok(self):
        # The row-parallel rule IS safe for inference under sp: forward
        # values match the unsharded apply (its backward is what
        # miscompiles — test_sp_conv_weight_grad_canary).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ofdmgan_tpu.models.full_unet import unet_param_shardings_rowparallel

        gen = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
        pg = gen.init(KEY, jnp.zeros((1, 64, 2)))
        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        sh = unet_param_shardings_rowparallel(pg, mesh)
        import flax

        specs = flax.traverse_util.flatten_dict(
            jax.tree_util.tree_map(lambda s: s.spec, sh)["params"])
        assert any("tp" in str(s) for s in specs.values())
        pgs = jax.device_put(pg, sh)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 64, 2)),
                        jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp", None)))
        y = jax.jit(gen.apply)(pgs, xs)
        y_ref = jax.jit(gen.apply)(pg, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)

    def test_sp_conv_weight_grad_canary(self):
        # Second canary (round 4): XLA SPMD also miscompiles the WEIGHT
        # gradient of a spatially-partitioned conv — even with a fully
        # REPLICATED kernel — when the partitioner keeps the grad convs
        # spatially sharded (scripts/sp_tp_conv_repro.py case 2). The
        # product dp x sp TRAINING path is nevertheless value-equivalent to
        # pure dp for the compiled training-step programs
        # (test_full_unet_dp_sp_layout_equivalence) — this canary tracks
        # the underlying primitive bug so the guard can be lifted when
        # upstream fixes it.
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 64, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 8, 16)), jnp.float32)

        def conv(h, w):
            return jax.lax.conv_general_dilated(
                h, w, (1,), ((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"))

        def loss(h, w):
            return jnp.sum(jnp.sin(conv(h, w)))

        _, gw_ref = jax.jit(jax.grad(loss, (0, 1)))(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp", None)))
        ks = jax.device_put(k, NamedSharding(mesh, P(None, None, None)))
        _, gw = jax.jit(jax.grad(loss, (0, 1)))(xs, ks)
        diff = float(jnp.max(jnp.abs(gw - gw_ref)))
        if diff < 1e-3:
            pytest.fail(
                "spatially-partitioned conv WEIGHT gradients now agree "
                f"(max abs diff {diff:.2e}) — the upstream miscompile is "
                "fixed; re-evaluate the sp x tp guard in parallel/gspmd.py "
                "and delete this canary.")

    def test_sp_tp_conv_partitioner_canary(self):
        # Minimal repro of the jax 0.9.0 XLA SPMD miscompile that motivates
        # the sp x tp guard: a conv whose LHS is sharded on the spatial dim
        # and whose kernel is sharded on C_out returns wrong VALUES (no
        # error). If this test starts reporting agreement, upstream fixed
        # it — lift the guard in parallel/gspmd.py and delete this canary.
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 64, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 8, 16)), jnp.float32)

        def conv(h, w):
            return jax.lax.conv_general_dilated(
                h, w, (1,), ((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"))

        ref = conv(x, k)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp", None)))
        ks = jax.device_put(k, NamedSharding(mesh, P(None, None, "tp")))
        diff = float(jnp.max(jnp.abs(jax.jit(conv)(xs, ks) - ref)))
        if diff < 1e-4:
            pytest.fail(
                "XLA's spatial x C_out conv partitioning now agrees with the "
                f"reference (max abs diff {diff:.2e}) — the upstream "
                "miscompile is fixed; lift the sp x tp guard in "
                "parallel/gspmd.py and delete this canary.")

    def test_mini_model_gspmd_matches_single_device(self):
        # replicated-params GSPMD dp run must equal the plain single-device
        # step given the same key (same global batch from the same key).
        from ofdmgan_tpu.training import TrainState, make_train_step

        mesh = make_mesh({"dp": 8})
        gen, critic = MiniGenerator(), MiniDiscriminator()
        x0 = jnp.zeros((1, 16, 2))
        pg = gen.init(KEY, x0)
        pd = critic.init(KEY, x0, x0)
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
        dg = DatagenConfig.make()
        loss = LossConfig(n_critic=2)

        make_state, gstep = make_gspmd_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss,
            global_batch_size=64, mesh=mesh, donate=False,
        )
        s_sharded = make_state(pg, pd)
        s_plain = TrainState.create(pg, pd, tx_g, tx_d)
        pstep = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, loss,
                                64, donate=False)
        k = jax.random.PRNGKey(9)
        out_g, m_g = gstep(s_sharded, k)
        out_p, m_p = pstep(s_plain, k)
        np.testing.assert_allclose(
            float(m_g["d_loss"]), float(m_p["d_loss"]), rtol=2e-4
        )
        a = jax.tree_util.tree_leaves(jax.device_get(out_g.params_g))[0]
        b = jax.tree_util.tree_leaves(jax.device_get(out_p.params_g))[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
