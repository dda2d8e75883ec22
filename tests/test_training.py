"""Training-step tests: loss semantics, full fused step, learning signal, and
shard_map data parallelism on the virtual 8-device mesh (the multi-device
story tested hardware-free, SURVEY.md §4.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models import MiniGenerator, MiniDiscriminator
from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.training import (
    LossConfig,
    TrainState,
    make_adam,
    make_eval_step,
    make_train_step,
)
from ofdmgan_tpu.parallel import make_mesh, make_sharded_train_step, replicate_state

KEY = jax.random.PRNGKey(0)


def _setup(batch=32, **loss_kw):
    gen = MiniGenerator()
    critic = MiniDiscriminator()
    x = jnp.zeros((1, 16, 2))
    params_g = gen.init(KEY, x)
    params_d = critic.init(KEY, x, x)
    tx_g = make_adam(1e-4)
    tx_d = make_adam(1e-4)
    state = TrainState.create(params_g, params_d, tx_g, tx_d)
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    loss = LossConfig(**loss_kw)
    return gen, critic, tx_g, tx_d, state, dg, loss


class TestTrainStep:
    def test_single_step_updates_params_and_metrics(self):
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        step = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, loss, 32, donate=False)
        new_state, metrics = step(state, KEY)
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "wasserstein_distance", "gradient_penalty",
                  "rec_loss", "adv_loss", "d_real_mean", "d_fake_mean"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        # params actually moved
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params_g, new_state.params_g
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_scan_steps_equivalent_count(self):
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        step4 = make_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss, 16, scan_steps=4, donate=False
        )
        new_state, _ = step4(state, KEY)
        assert int(new_state.step) == 4

    def test_outer_unroll_identical_numerics(self):
        """lax.scan unroll is pure codegen: outer_unroll=2 must produce the
        SAME params/metrics as the rolled scan (bench.py --outer_unroll)."""
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        kw = dict(batch_size=16, scan_steps=4, donate=False)
        s1 = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, loss, **kw)
        s2 = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, loss,
                             outer_unroll=2, **kw)
        n1, m1 = s1(state, KEY)
        n2, m2 = s2(state, KEY)
        for a, b in zip(jax.tree_util.tree_leaves(n1.params_g),
                        jax.tree_util.tree_leaves(n2.params_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=0, atol=0)

    def test_loss_decreases_over_training(self):
        # ~60 outer steps at batch 256 should clearly reduce L1 vs the start:
        # the generator at minimum learns to shrink toward the conditional
        # mean. This is the "ONE model end-to-end" milestone check.
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        tx_g = make_adam(1e-3)
        tx_d = make_adam(1e-3)
        state = TrainState.create(state.params_g, state.params_d, tx_g, tx_d)
        step = make_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss, 256, scan_steps=20, donate=False
        )
        ev = make_eval_step(gen.apply, dg, 1024)
        before = float(ev(state.params_g, jax.random.PRNGKey(99))["rec_loss"])
        for i in range(10):
            state, metrics = step(state, jax.random.fold_in(KEY, i))
        after = float(ev(state.params_g, jax.random.PRNGKey(99))["rec_loss"])
        assert after < before * 0.8, (before, after)

    def test_supervised_fast_path_bit_exact(self):
        # n_critic=0 (supervised fast path) must reproduce the generator
        # trajectory of an adv_weight=0 GAN step BIT-EXACTLY: with
        # adv_weight 0 the critic's contribution to the generator gradient
        # is 0.0 * finite = 0.0 exactly, and the k_data/k_crit key split is
        # identical in both paths. This is the guarantee that lets the
        # full-scale supervised champion recipe skip all critic compute.
        gen, critic, tx_g, tx_d, state, dg, loss = _setup(
            adv_weight=0.0, n_critic=5)
        step_gan = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg,
                                   loss, 32, scan_steps=3, donate=False)
        loss_fast = LossConfig(adv_weight=0.0, n_critic=0)
        step_fast = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg,
                                    loss_fast, 32, scan_steps=3, donate=False)
        s_gan, m_gan = step_gan(state, KEY)
        s_fast, m_fast = step_fast(state, KEY)
        for a, b in zip(jax.tree_util.tree_leaves(s_gan.params_g),
                        jax.tree_util.tree_leaves(s_fast.params_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # critic tree rides through untouched; adversarial metrics log zeros
        for a, b in zip(jax.tree_util.tree_leaves(state.params_d),
                        jax.tree_util.tree_leaves(s_fast.params_d)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(m_fast["g_loss"]) == float(m_gan["g_loss"])
        for k in ("d_loss", "wasserstein_distance", "gradient_penalty",
                  "adv_loss"):
            assert float(m_fast[k]) == 0.0, k

    def test_supervised_fast_path_requires_adv_weight_zero(self):
        gen, critic, tx_g, tx_d, state, dg, _ = _setup()
        with pytest.raises(ValueError, match="supervised fast path"):
            make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg,
                            LossConfig(adv_weight=1.0, n_critic=0), 32,
                            donate=False)

    def test_fresh_critic_batches_mode(self):
        gen, critic, tx_g, tx_d, state, dg, loss = _setup(fresh_critic_batches=True)
        step = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, loss, 16, donate=False)
        new_state, metrics = step(state, KEY)
        assert np.isfinite(float(metrics["d_loss"]))

    def test_bf16_activation_storage_step(self):
        # act_dtype="bfloat16" is a STORAGE format: params, matmul
        # accumulation and optimizer state stay f32, but materialized
        # activations (and the batch tensors) are held in bf16, halving the
        # HBM traffic of the memory-bound fused step. First-step metrics
        # must track the f32 step closely, and training must still learn.
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        gen_b = MiniGenerator(act_dtype="bfloat16")
        critic_b = MiniDiscriminator(act_dtype="bfloat16")
        step_f32 = make_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss, 64, donate=False)
        step_b16 = make_train_step(
            gen_b.apply, critic_b.apply, tx_g, tx_d, dg, loss, 64,
            act_dtype="bfloat16", donate=False)
        _, m32 = step_f32(state, KEY)
        new_state, m16 = step_b16(state, KEY)
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m32[k]), float(m16[k])
            assert np.isfinite(b), k
            assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)
        # params stayed f32 and moved
        for leaf in jax.tree_util.tree_leaves(new_state.params_g):
            assert leaf.dtype == jnp.float32
        # learns: ~200 steps at batch 256 shrink eval L1 like the f32 path
        tx_g2, tx_d2 = make_adam(1e-3), make_adam(1e-3)
        st = TrainState.create(state.params_g, state.params_d, tx_g2, tx_d2)
        step = make_train_step(
            gen_b.apply, critic_b.apply, tx_g2, tx_d2, dg, loss, 256,
            scan_steps=20, act_dtype="bfloat16", donate=False)
        ev = make_eval_step(gen.apply, dg, 1024)
        before = float(ev(st.params_g, jax.random.PRNGKey(99))["rec_loss"])
        for i in range(10):
            st, _ = step(st, jax.random.fold_in(KEY, i))
        after = float(ev(st.params_g, jax.random.PRNGKey(99))["rec_loss"])
        assert after < before * 0.8, (before, after)

    def test_eval_step(self):
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        ev = make_eval_step(gen.apply, dg, 64)
        m = ev(state.params_g, KEY)
        assert np.isfinite(float(m["rec_loss"])) and np.isfinite(float(m["mse"]))


class TestShardedTrainStep:
    def test_dp8_runs_and_matches_semantics(self):
        assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
        mesh = make_mesh({"dp": 8})
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        step = make_sharded_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss,
            global_batch_size=64, mesh=mesh, donate=False,
        )
        state_r = replicate_state(state, mesh)
        new_state, metrics = step(state_r, KEY)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["d_loss"]))
        # Output state is replicated (single logical value).
        leaf = jax.tree_util.tree_leaves(new_state.params_g)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp8_flat_bf16_headline_config(self):
        """The bench.py headline configuration (flat applies + bf16 storage
        + bf16_tf32gp + flat datagen) composes with shard_map dp — what
        train.py --flat --dp N wires up (training/trainer.py)."""
        from ofdmgan_tpu.models.flat import (make_critic_flat_apply,
                                             make_generator_flat_apply)
        from ofdmgan_tpu.signal.datagen import synthetic_batch_flat

        mesh = make_mesh({"dp": 8})
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        step = make_sharded_train_step(
            make_generator_flat_apply(act_dtype="bfloat16"),
            make_critic_flat_apply(act_dtype="bfloat16"),
            tx_g, tx_d, dg, loss, global_batch_size=64, mesh=mesh,
            donate=False, matmul_precision="bf16_tf32gp",
            act_dtype="bfloat16", critic_unroll=5,
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg))
        state_r = replicate_state(state, mesh)
        new_state, metrics = step(state_r, KEY)
        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "gradient_penalty"):
            assert np.isfinite(float(metrics[k])), k
        leaf = jax.tree_util.tree_leaves(new_state.params_g)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_grads_equal_global_batch_grads(self):
        # pmean-of-local-grads == grad-of-global-mean: run 1 critic update
        # with fresh_critic_batches=False on dp=4 vs a single device fed the
        # concatenation of the four per-device batches.
        from ofdmgan_tpu.training.wgan_gp import critic_loss_fn
        from ofdmgan_tpu.signal.datagen import synthetic_batch
        from ofdmgan_tpu.parallel.mesh import fold_device_key

        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        key = jax.random.PRNGKey(5)
        # Build the 4 per-device batches exactly as the sharded step would.
        batches = [
            synthetic_batch(jax.random.fold_in(key, i), 8, dg) for i in range(4)
        ]
        merged = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *batches
        )
        gp_key = jax.random.PRNGKey(7)

        # NOTE: GP epsilon sampling differs between per-device and merged
        # runs (different shapes), so compare the GP-free part: set gp_weight
        # to 0 for this equivalence check.
        loss0 = LossConfig(gp_weight=0.0)
        grads_global = jax.grad(
            lambda p: critic_loss_fn(
                p, state.params_g, gen.apply, critic.apply, merged, gp_key, loss0
            )[0]
        )(state.params_d)
        grads_local = [
            jax.grad(
                lambda p: critic_loss_fn(
                    p, state.params_g, gen.apply, critic.apply, b, gp_key, loss0
                )[0]
            )(state.params_d)
            for b in batches
        ]
        grads_mean = jax.tree_util.tree_map(
            lambda *gs: sum(gs) / len(gs), *grads_local
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(grads_global),
            jax.tree_util.tree_leaves(grads_mean),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_2d_mesh_with_spare_axis(self):
        mesh = make_mesh({"dp": 4, "tp": 2})
        gen, critic, tx_g, tx_d, state, dg, loss = _setup()
        step = make_sharded_train_step(
            gen.apply, critic.apply, tx_g, tx_d, dg, loss,
            global_batch_size=32, mesh=mesh, donate=False,
        )
        new_state, metrics = step(replicate_state(state, mesh), KEY)
        assert np.isfinite(float(metrics["g_loss"]))


class TestImageDatasetDP:
    """Image-backed training composed with shard_map data parallelism
    (round-2: lifts the round-1 NotImplementedError, trainer.py)."""

    def _make_images(self, d, n=3):
        from PIL import Image

        rng = np.random.default_rng(0)
        for i in range(n):
            Image.fromarray(rng.integers(0, 256, (16, 16)).astype(np.uint8)).save(
                d / f"img{i}.png")

    def test_image_dir_with_dp8(self, tmp_path):
        from ofdmgan_tpu.training.trainer import Trainer

        self._make_images(tmp_path)
        config = {
            "ofdm": {"frame_length": 16, "num_subcarriers": 8, "cp_length": 2,
                     "modulation": "QPSK"},
            "training": {"batch_size": 32, "epochs": 1,
                         "optimizer": {"lr_generator": 1e-4, "lr_discriminator": 1e-4}},
            "logging": {"tensorboard": False},
        }
        trainer = Trainer(config=config, image_dir=str(tmp_path),
                          samples_per_epoch=64, data_parallel=8)
        before = jax.device_get(trainer.state.params_g)
        tm = trainer.train_epoch(0)
        assert all(np.isfinite(v) for v in tm.values()), tm
        vm = trainer.validate()
        assert np.isfinite(vm["rec_loss"]) and np.isfinite(vm["mse"])
        after = jax.device_get(trainer.state.params_g)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))), before, after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0


class TestTrainerGSPMD:
    """train.py --strategy gspmd: the Trainer drives the pjit dp x tp (x sp)
    step end-to-end — epoch, validation, checkpoint save + resume with the
    captured shardings restored (trainer._place_state)."""

    def _config(self, fl=64):
        return {
            "ofdm": {"frame_length": fl, "num_subcarriers": 16, "cp_length": 4,
                     "modulation": "QPSK"},
            "training": {"batch_size": 16, "epochs": 1,
                         "optimizer": {"lr_generator": 1e-4, "lr_discriminator": 1e-4}},
            "logging": {"tensorboard": False},
        }

    def _trainer(self, tmp_path, **kw):
        from ofdmgan_tpu.models.full_unet import FullDiscriminator, FullUNetGenerator
        from ofdmgan_tpu.training.trainer import Trainer

        cfg = self._config()
        cfg["training"]["checkpoint_dir"] = str(tmp_path / "ckpt")
        cfg["logging"] = {"tensorboard": False, "log_dir": str(tmp_path / "logs")}
        return Trainer(
            config=cfg,
            generator=FullUNetGenerator(frame_length=64, levels=3, base_channels=8),
            discriminator=FullDiscriminator(frame_length=64, levels=3, base_channels=8),
            samples_per_epoch=32, strategy="gspmd", **kw)

    def test_gspmd_dp_tp_epoch_validate_resume(self, tmp_path):
        import flax

        trainer = self._trainer(tmp_path, data_parallel=4, tensor_parallel=2)
        specs = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(
            lambda a: str(a.sharding.spec), trainer.state.params_g)["params"])
        assert any("tp" in s for s in specs.values()), specs
        tm = trainer.train_epoch(0)
        assert all(np.isfinite(v) for v in tm.values()), tm
        vm = trainer.validate()
        assert np.isfinite(vm["rec_loss"]) and np.isfinite(vm["mse"])
        ckpt = tmp_path / "ckpt" / "state"
        trainer.save_checkpoint(ckpt)

        resumed = self._trainer(tmp_path, data_parallel=4, tensor_parallel=2)
        resumed.load_checkpoint(str(ckpt))
        # restored params carry the tp shardings again
        specs2 = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(
            lambda a: str(a.sharding.spec), resumed.state.params_g)["params"])
        assert specs2 == specs
        # and the restored values match
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trainer.state.params_g)),
                        jax.tree_util.tree_leaves(jax.device_get(resumed.state.params_g))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tm2 = resumed.train_epoch(1)
        assert all(np.isfinite(v) for v in tm2.values()), tm2

    def test_gspmd_dp_sp_epoch(self, tmp_path):
        trainer = self._trainer(tmp_path, data_parallel=4, seq_parallel=2)
        tm = trainer.train_epoch(0)
        assert all(np.isfinite(v) for v in tm.values()), tm

    def test_gspmd_rejects_mini_tp_and_flat(self, tmp_path):
        from ofdmgan_tpu.training.trainer import Trainer

        with pytest.raises(ValueError, match="full"):
            Trainer(config=self._config(fl=16), samples_per_epoch=32,
                    strategy="gspmd", data_parallel=4, tensor_parallel=2)
        with pytest.raises(ValueError, match="flat_step"):
            Trainer(config=self._config(fl=16), samples_per_epoch=32,
                    strategy="gspmd", data_parallel=4, flat_step=True)
        with pytest.raises(ValueError, match="gspmd"):
            Trainer(config=self._config(fl=16), samples_per_epoch=32,
                    data_parallel=4, tensor_parallel=2)


class TestLanePacking:
    def test_packed_matmul_numerics_and_grads(self):
        """The lane-packed matmul path (ops/dense_conv.LANE_PACK — off by
        default, see the measured-regression note there) must stay
        numerically identical to the unpacked lowering, including first and
        second derivatives (the GP needs grad-of-grad)."""
        import ofdmgan_tpu.ops.dense_conv as dc

        k = jax.random.PRNGKey(3)
        x = jax.random.normal(k, (64, 16, 4))
        w = jax.random.normal(jax.random.fold_in(k, 1), (3, 4, 8)) * 0.3
        b = jax.random.normal(jax.random.fold_in(k, 2), (8,)) * 0.1

        def loss(w, x, packed):
            old = dc.LANE_PACK
            dc.LANE_PACK = packed
            try:
                y = dc.conv1d_via_matmul(x, w, b, 2, 1)
            finally:
                dc.LANE_PACK = old
            return jnp.sum(jnp.tanh(y) ** 2)

        for fn in (loss,
                   lambda w, x, p: jnp.sum(jax.grad(loss, argnums=1)(w, x, p) ** 2)):
            ref = jax.jit(lambda w, x: fn(w, x, False))(w, x)
            got = jax.jit(lambda w, x: fn(w, x, True))(w, x)
            np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
            gr = jax.jit(jax.grad(lambda w, x: fn(w, x, False)))(w, x)
            gg = jax.jit(jax.grad(lambda w, x: fn(w, x, True)))(w, x)
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                       rtol=1e-4, atol=1e-6)
