"""Parity tests: flat-layout applies (models/flat.py) == flax modules.

The flat path folds upsamples/concat/pool into dense matrices at trace
time; numerically it must match models/{generator,critic}.py to f32
summation-order noise, including through gradients and the full fused
train step (the GP's grad-of-grad exercises second-order agreement)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.flat import (
    make_critic_flat_apply,
    make_generator_flat_apply,
)
from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch
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


class TestTrainingParity:
    def _steps(self, gen_apply, critic_apply, n=5, act_dtype=None):
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
                               act_dtype=act_dtype)
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
