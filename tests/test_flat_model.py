"""Parity tests: flat-layout applies (models/flat.py) == flax modules.

The flat path folds upsamples/concat/pool into dense matrices at trace
time; numerically it must match models/{generator,critic}.py to f32
summation-order noise, including through gradients and the full fused
train step (the GP's grad-of-grad exercises second-order agreement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.critic import compute_gradient_penalty
from ofdmgan_tpu.models.flat import (
    make_critic_flat_apply,
    make_generator_flat_apply,
    tf32_matmul,
)
from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch
from ofdmgan_tpu.signal.datagen import synthetic_batch_flat
from ofdmgan_tpu.training import LossConfig, TrainState, make_adam, make_train_step

KEY = jax.random.PRNGKey(7)


def _data(batch=64):
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    return synthetic_batch(jax.random.PRNGKey(3), batch, dg)


class TestForwardParity:
    def test_generator_tanh_head(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        flat = make_generator_flat_apply()
        x = _data()["noisy"]
        np.testing.assert_allclose(gen.apply(params, x), flat(params, x),
                                   atol=1e-5, rtol=1e-5)

    def test_generator_residual_head(self):
        gen = MiniGenerator(input_residual=True)
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        flat = make_generator_flat_apply(input_residual=True)
        x = _data()["noisy"]
        np.testing.assert_allclose(gen.apply(params, x), flat(params, x),
                                   atol=1e-5, rtol=1e-5)

    def test_generator_flat_io(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        flat = make_generator_flat_apply()
        x = _data()["noisy"]
        y = flat(params, x.reshape(x.shape[0], 32))
        np.testing.assert_allclose(
            y, gen.apply(params, x).reshape(x.shape[0], 32), atol=1e-5, rtol=1e-5)

    def test_critic(self):
        critic = MiniDiscriminator()
        z = jnp.zeros((1, 16, 2))
        params = critic.init(KEY, z, z)
        flat = make_critic_flat_apply()
        d = _data()
        np.testing.assert_allclose(
            critic.apply(params, d["clean"], d["noisy"]),
            flat(params, d["clean"], d["noisy"]), atol=1e-5, rtol=1e-5)


class TestFlatDatagen:
    def test_matches_synthetic_batch(self):
        """Same PRNG stream, matmul-DFT vs FFT: flat datagen == reference
        datagen reshaped, to f32 rounding."""
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        k = jax.random.PRNGKey(11)
        ref = synthetic_batch(k, 256, dg)
        flat = synthetic_batch_flat(k, 256, dg)
        np.testing.assert_allclose(flat["snr"], ref["snr"], rtol=1e-6)
        for name in ("noisy", "clean"):
            np.testing.assert_allclose(
                flat[name], ref[name].reshape(256, 32), atol=3e-5, rtol=1e-4)

    def test_parametric_length(self):
        dg = DatagenConfig.make(frame_length=64, snr_range=(5, 15))
        k = jax.random.PRNGKey(12)
        ref = synthetic_batch(k, 64, dg)
        flat = synthetic_batch_flat(k, 64, dg)
        np.testing.assert_allclose(
            flat["clean"], ref["clean"].reshape(64, 128), atol=5e-5, rtol=1e-4)

    def test_rejects_unsupported_configs(self):
        import pytest
        dg = DatagenConfig.make(frame_length=16, nonlinear=True)
        with pytest.raises(ValueError):
            synthetic_batch_flat(jax.random.PRNGKey(0), 8, dg)


class TestTf32Matmul:
    def test_forward_accuracy_between_bf16_and_f32(self):
        """bf16x3 carries ~19 mantissa bits: much closer to f32 than a
        single bf16 pass."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        x = jax.random.normal(k1, (128, 64), jnp.float32)
        a = jax.random.normal(k2, (64, 32), jnp.float32)
        exact = x @ a
        tf32 = tf32_matmul(x, a)
        bf16 = (x.astype(jnp.bfloat16).astype(jnp.float32)
                @ a.astype(jnp.bfloat16).astype(jnp.float32))
        err_tf32 = float(jnp.abs(tf32 - exact).max())
        err_bf16 = float(jnp.abs(bf16 - exact).max())
        assert err_tf32 < 0.35 * err_bf16, (err_tf32, err_bf16)
        assert err_tf32 < 5e-3

    def test_bf16_input_skips_low_pass(self):
        """A bf16 operand has an exactly-zero low half — the result must
        equal the full decomposition on its f32 upcast."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        x = jax.random.normal(k1, (32, 16), jnp.float32).astype(jnp.bfloat16)
        a = jax.random.normal(k2, (16, 8), jnp.float32)
        np.testing.assert_allclose(
            tf32_matmul(x, a), tf32_matmul(x.astype(jnp.float32), a),
            atol=1e-6, rtol=1e-6)

    def test_gradients_all_orders(self):
        """grad and grad-of-grad through tf32_matmul agree with exact-f32
        autodiff to tf32 tolerance (the GP chain needs second order)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        x = jax.random.normal(k1, (16, 8), jnp.float32)
        a = jax.random.normal(k2, (8, 4), jnp.float32)

        def loss(f, x, a):
            g = jax.grad(lambda xx: jnp.sum(jnp.tanh(f(xx, a))))(x)
            return jnp.sum(g * g)

        exact_val = loss(jnp.matmul, x, a)
        exact_grad = jax.grad(loss, argnums=2)(jnp.matmul, x, a)
        val = loss(tf32_matmul, x, a)
        grad = jax.grad(loss, argnums=2)(tf32_matmul, x, a)
        np.testing.assert_allclose(val, exact_val, rtol=2e-2)
        np.testing.assert_allclose(grad, exact_grad, atol=2e-2, rtol=5e-2)


class TestTf32x3Apply:
    def test_critic_forward_close_to_f32(self):
        critic = MiniDiscriminator()
        z = jnp.zeros((1, 16, 2))
        params = critic.init(KEY, z, z)
        d = _data()
        ref = critic.apply(params, d["clean"], d["noisy"])
        out = make_critic_flat_apply(mm="tf32x3")(params, d["clean"], d["noisy"])
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_generator_forward_close_to_f32(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        x = _data()["noisy"]
        ref = gen.apply(params, x)
        out = make_generator_flat_apply(mm="tf32x3")(params, x)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_gradient_penalty_grad_of_grad(self):
        """The GP (norm of ∇ₓD, then ∇_θ of that) through the explicit
        decomposition tracks the f32 reference — second-order transposes
        included, via custom_jvp recursion."""
        critic = MiniDiscriminator()
        z = jnp.zeros((1, 16, 2))
        params = critic.init(KEY, z, z)
        d = _data()
        fake = d["noisy"] * 0.9
        kgp = jax.random.PRNGKey(21)

        def gp_with(apply_fn):
            def f(p):
                return compute_gradient_penalty(
                    apply_fn, p, d["clean"], fake, d["noisy"], kgp)
            return jax.value_and_grad(f)(params)

        v_ref, g_ref = gp_with(make_critic_flat_apply())
        v_x3, g_x3 = gp_with(make_critic_flat_apply(mm="tf32x3"))
        np.testing.assert_allclose(v_x3, v_ref, rtol=5e-2)
        ref_leaves = jax.tree_util.tree_leaves(g_ref)
        x3_leaves = jax.tree_util.tree_leaves(g_x3)
        scale = max(float(jnp.abs(l).max()) for l in ref_leaves)
        for a, b in zip(ref_leaves, x3_leaves):
            assert float(jnp.abs(a - b).max()) < 5e-2 * scale


class TestTrainingParity:
    def _steps(self, gen_apply, critic_apply, n=5, act_dtype=None,
               batch_fn=None, critic_unroll=1, **step_kwargs):
        gen = MiniGenerator()
        critic = MiniDiscriminator()
        z = jnp.zeros((1, 16, 2))
        params_g = gen.init(KEY, z)
        params_d = critic.init(KEY, z, z)
        tx_g, tx_d = make_adam(1e-3), make_adam(1e-3)
        state = TrainState.create(params_g, params_d, tx_g, tx_d)
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        step = make_train_step(gen_apply, critic_apply, tx_g, tx_d, dg,
                               LossConfig(), 128, donate=False,
                               act_dtype=act_dtype, batch_fn=batch_fn,
                               critic_unroll=critic_unroll, **step_kwargs)
        out = []
        for i in range(n):
            state, m = step(state, jax.random.fold_in(KEY, i))
            out.append(m)
        return state, out

    def test_full_step_trajectory_matches(self):
        gen, critic = MiniGenerator(), MiniDiscriminator()
        s_ref, m_ref = self._steps(gen.apply, critic.apply)
        s_flat, m_flat = self._steps(make_generator_flat_apply(),
                                     make_critic_flat_apply())
        # identical PRNG stream + same math -> trajectories agree to
        # accumulated f32 noise over 5 steps
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty",
                  "wasserstein_distance"):
            a, b = float(m_ref[-1][k]), float(m_flat[-1][k])
            assert abs(a - b) <= 2e-3 * max(1.0, abs(a)), (k, a, b)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s_ref.params_g, s_flat.params_g)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3

    def test_full_step_benched_config(self):
        """The exact bench.py --flat --mm tf32x3 --act_dtype bfloat16
        --critic_unroll 5 step tracks the f32 reference trajectory: flat
        matmul-form datagen, explicit bf16x3 dots, unrolled critic scan."""
        gen, critic = MiniGenerator(), MiniDiscriminator()
        _, m_ref = self._steps(gen.apply, critic.apply, n=3)
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        _, m_fast = self._steps(
            make_generator_flat_apply(act_dtype="bfloat16", mm="tf32x3"),
            make_critic_flat_apply(act_dtype="bfloat16", mm="tf32x3"),
            n=3, act_dtype="bfloat16",
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
            critic_unroll=5)
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_ref[-1][k]), float(m_fast[-1][k])
            assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)

    def test_full_step_gp_closure(self):
        """critic_apply_gp (explicit tf32x3 dots for JUST the GP chain,
        bench.py --mm tf32x3_gp) computes the same stochastic function as
        the gp_precision-context path — same epsilon stream, dots within
        tf32 rounding of each other."""
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        common = dict(
            act_dtype="bfloat16", matmul_precision="bf16_tf32gp",
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
            critic_unroll=5)
        ga = make_generator_flat_apply(act_dtype="bfloat16")
        ca = make_critic_flat_apply(act_dtype="bfloat16")
        _, m_ctx = self._steps(ga, ca, n=3, **common)
        _, m_clo = self._steps(
            ga, ca, n=3,
            critic_apply_gp=make_critic_flat_apply(
                act_dtype="bfloat16", mm="tf32x3"),
            **common)
        for k in ("d_loss", "g_loss", "gradient_penalty", "rec_loss"):
            a, b = float(m_ctx[-1][k]), float(m_clo[-1][k])
            assert abs(a - b) <= 0.02 * max(1.0, abs(a)), (k, a, b)

    def test_full_step_remat(self):
        """remat=True (jax.checkpoint applies) recomputes instead of storing
        activations — same stochastic function, equal up to fusion
        reassociation (measured delta ~4e-6 on CPU)."""
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        common = dict(
            act_dtype="bfloat16", matmul_precision="bf16_tf32gp",
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
            critic_unroll=5)
        ga = make_generator_flat_apply(act_dtype="bfloat16")
        ca = make_critic_flat_apply(act_dtype="bfloat16")
        _, m_plain = self._steps(ga, ca, n=1, **common)
        _, m_remat = self._steps(ga, ca, n=1, remat=True, **common)
        for k in ("d_loss", "g_loss", "gradient_penalty", "rec_loss"):
            # single step: reassociation-level agreement; over many steps the
            # bf16 adversarial dynamics amplify the 1e-6 seed like any
            # reordering does (cf. the 0.05-tolerance trajectory tests)
            a, b = float(m_plain[-1][k]), float(m_remat[-1][k])
            assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (k, a, b)

    @pytest.mark.parametrize("expand", ["dus", "onehot"])
    def test_full_step_premap(self, expand):
        """The expansion-once premapped step (bench.py --premap, the r4
        headline config with --conv_expand onehot) computes the same
        stochastic function as the per-apply-site flat step: same PRNG
        stream, same math, the Toeplitz matrices merely built once per
        parameter value per loss instead of once per apply site."""
        from ofdmgan_tpu.models.flat import (make_critic_flat_parts,
                                             make_generator_flat_parts)
        from ofdmgan_tpu.ops import dense_conv

        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        common = dict(
            act_dtype="bfloat16",
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
            critic_unroll=5)
        _, m_site = self._steps(
            make_generator_flat_apply(act_dtype="bfloat16"),
            make_critic_flat_apply(act_dtype="bfloat16"), n=3, **common)
        old = dense_conv.CONV_EXPAND
        dense_conv.CONV_EXPAND = expand
        try:
            gp, ga = make_generator_flat_parts(act_dtype="bfloat16")
            cp, ca = make_critic_flat_parts(act_dtype="bfloat16")
            _, m_pre = self._steps(ga, ca, n=3, gen_premap=gp,
                                   critic_premap=cp, **common)
        finally:
            dense_conv.CONV_EXPAND = old
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_site[-1][k]), float(m_pre[-1][k])
            assert abs(a - b) <= 0.02 * max(1.0, abs(a)), (k, a, b)

    def test_full_step_premap_gp_closure_headline(self):
        """The exact r4 headline step — --premap --conv_expand onehot
        --mm tf32x3_gp --act_dtype bfloat16 --critic_unroll 5 — tracks the
        f32 reference trajectory (the same guarantee round 3 proved for
        the per-site step, test_full_step_benched_config)."""
        from ofdmgan_tpu.models.flat import (make_critic_flat_parts,
                                             make_generator_flat_parts)
        from ofdmgan_tpu.ops import dense_conv

        gen, critic = MiniGenerator(), MiniDiscriminator()
        _, m_ref = self._steps(gen.apply, critic.apply, n=3)
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        old = dense_conv.CONV_EXPAND
        dense_conv.CONV_EXPAND = "onehot"
        try:
            gp, ga = make_generator_flat_parts(act_dtype="bfloat16")
            cp, ca = make_critic_flat_parts(act_dtype="bfloat16")
            _, cagp = make_critic_flat_parts(act_dtype="bfloat16",
                                             mm="tf32x3")
            _, m_fast = self._steps(
                ga, ca, n=3, act_dtype="bfloat16",
                batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
                critic_unroll=5, gen_premap=gp, critic_premap=cp,
                critic_apply_gp=cagp)
        finally:
            dense_conv.CONV_EXPAND = old
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_ref[-1][k]), float(m_fast[-1][k])
            assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)

    def test_flat_dft_mats_cache_is_trace_safe(self):
        """Regression: _flat_dft_mats must not cache trace-local constants.
        First call INSIDE a jit trace, then use from a second trace — the
        lru-cached jnp version leaked tracers (UnexpectedTracerError)."""
        from ofdmgan_tpu.signal.datagen import _flat_dft_mats
        _flat_dft_mats.cache_clear()
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        first = jax.jit(lambda k: synthetic_batch_flat(k, 8, dg)["noisy"])(KEY)
        second = jax.jit(lambda k: synthetic_batch_flat(k, 8, dg)["clean"])(KEY)
        assert np.isfinite(np.asarray(first)).all()
        assert np.isfinite(np.asarray(second)).all()

    def test_full_step_bf16_storage(self):
        gen = MiniGenerator(act_dtype="bfloat16")
        critic = MiniDiscriminator(act_dtype="bfloat16")
        _, m_ref = self._steps(gen.apply, critic.apply, n=2,
                               act_dtype="bfloat16")
        _, m_flat = self._steps(
            make_generator_flat_apply(act_dtype="bfloat16"),
            make_critic_flat_apply(act_dtype="bfloat16"), n=2,
            act_dtype="bfloat16")
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_ref[-1][k]), float(m_flat[-1][k])
            assert abs(a - b) <= 0.03 * max(1.0, abs(a)), (k, a, b)

    def test_full_step_fp8_storage(self):
        """fp8 activation STORAGE (stored float8_e4m3fn, exact upcast into
        the same bf16-operand/f32-accumulate dots): module and flat paths
        compute the same step, metrics finite and GP-sane. fp8 has no
        implicit promotion, so this exercises every explicit-upcast site
        (GP interpolant/norm, gen-loss L1, critic concat, dense_conv)."""
        AD = "float8_e4m3fn"
        gen = MiniGenerator(act_dtype=AD)
        critic = MiniDiscriminator(act_dtype=AD)
        _, m_ref = self._steps(gen.apply, critic.apply, n=2, act_dtype=AD,
                               matmul_precision="bf16_tf32gp")
        _, m_flat = self._steps(
            make_generator_flat_apply(act_dtype=AD),
            make_critic_flat_apply(act_dtype=AD), n=2, act_dtype=AD,
            matmul_precision="bf16_tf32gp")
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_ref[-1][k]), float(m_flat[-1][k])
            assert np.isfinite(a) and np.isfinite(b), (k, a, b)
            assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)
        assert 0.0 < float(m_flat[-1]["gradient_penalty"]) < 5.0

    def test_fp8_residual_head_and_fp8_flat_datagen(self):
        """Residual head + flat matmul-form datagen compose with fp8
        storage (the bench --flat --act_dtype float8_e4m3fn config)."""
        AD = "float8_e4m3fn"
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        _, m = self._steps(
            make_generator_flat_apply(act_dtype=AD, input_residual=True),
            make_critic_flat_apply(act_dtype=AD), n=2, act_dtype=AD,
            matmul_precision="bf16_tf32gp",
            batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
            critic_unroll=5)
        for k in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            assert np.isfinite(float(m[-1][k])), (k, m[-1][k])


class TestTrainerTf32x3GpMode:
    """train.py --flat --mm tf32x3_gp: Trainer builds the bench.py fastest
    on-chip config (ambient model dots + explicit-tf32x3 GP chain,
    results/r3_perf_queue.jsonl) so its 500-epoch stability twin runs
    through the standard trainer."""

    def _config(self):
        return {
            "ofdm": {"frame_length": 16, "num_subcarriers": 8,
                     "cp_length": 2, "modulation": "QPSK"},
            "training": {"batch_size": 32, "epochs": 1,
                         "optimizer": {"lr_generator": 1e-4,
                                       "lr_discriminator": 1e-4}},
            "logging": {"tensorboard": False},
        }

    def test_one_epoch_runs_and_learns(self):
        from ofdmgan_tpu.training.trainer import Trainer

        trainer = Trainer(config=self._config(), samples_per_epoch=64,
                          data_parallel=1, flat_step=True, mm="tf32x3_gp",
                          act_dtype="bfloat16", critic_unroll=5,
                          matmul_precision="bf16_tf32gp")
        before = jax.device_get(trainer.state.params_g)
        tm = trainer.train_epoch(0)
        assert all(np.isfinite(v) for v in tm.values()), tm
        after = jax.device_get(trainer.state.params_g)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))), before, after)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    def test_dp_gt1_rejected(self):
        from ofdmgan_tpu.training.trainer import Trainer

        with pytest.raises(ValueError, match="tf32x3_gp"):
            Trainer(config=self._config(), samples_per_epoch=64,
                    data_parallel=8, flat_step=True, mm="tf32x3_gp",
                    act_dtype="bfloat16",
                    matmul_precision="bf16_tf32gp")
