"""Fused critic-gradient kernel: exact parity with jax.grad.

The kernel receives the SAME per-sample interpolation epsilons the
jax.random stream produces, so — unlike the datagen kernel — parity here
is exact numerical equality (to float tolerance), testable in the Pallas
interpreter on CPU: every parameter gradient, including the hand-derived
second-order gradient-penalty terms, against
jax.value_and_grad(wgan_gp.critic_loss_fn)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.critic import compute_gradient_penalty
from ofdmgan_tpu.ops.pallas_critic import critic_grad_pallas, pack_h0
from ofdmgan_tpu.training.wgan_gp import LossConfig, critic_loss_fn

KEY = jax.random.PRNGKey(0)


def _setup(b=64):
    gen, critic = MiniGenerator(), MiniDiscriminator()
    x0 = jnp.zeros((1, 16, 2))
    pg = gen.init(KEY, x0)
    pd = critic.init(KEY, x0, x0)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    clean = jax.random.normal(ks[0], (b, 16, 2))
    noisy = clean + 0.3 * jax.random.normal(ks[1], (b, 16, 2))
    fake = jnp.tanh(jax.random.normal(ks[2], (b, 16, 2)))
    return gen, critic, pg, pd, clean, noisy, fake, ks[3]


class TestFusedCriticGrad:
    @pytest.mark.parametrize("b", [8, 64])
    def test_exact_parity_with_jax_grad(self, b):
        gen, critic, pg, pd, clean, noisy, fake, k_gp = _setup(b)
        cfg = LossConfig()

        batch = {"noisy": noisy, "clean": clean}
        (_, aux_ref), grads_ref = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(
            pd, pg, lambda p, x: gen.apply(p, x),
            lambda p, c, n: critic.apply(p, c, n), batch, k_gp, cfg)
        # critic_loss_fn computes fake = stop_grad(G(noisy)); reproduce the
        # identical fake for the fused call
        fake_ref = jax.lax.stop_gradient(gen.apply(pg, noisy))
        eps = jax.random.uniform(k_gp, (b,) + (1, 1), clean.dtype)[:, 0, 0]

        with pltpu.force_tpu_interpret_mode():
            grads, aux = critic_grad_pallas(
                pd, pack_h0(clean, noisy), pack_h0(fake_ref, noisy), eps,
                cfg, block_rows=32)

        flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(grads))
        assert set(flat) == {p for p, _ in flat_ref}
        for path, ref in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(ref),
                rtol=2e-4, atol=2e-6, err_msg=str(path))
        for name in ("d_loss", "wasserstein_distance", "gradient_penalty",
                     "d_real_mean", "d_fake_mean"):
            np.testing.assert_allclose(float(aux[name]), float(aux_ref[name]),
                                       rtol=1e-4, atol=1e-6, err_msg=name)

    def test_gp_second_order_nonzero(self):
        """The GP terms must actually contribute (guards against a kernel
        that silently drops the second-order path)."""
        gen, critic, pg, pd, clean, noisy, fake, k_gp = _setup(32)
        eps = jax.random.uniform(k_gp, (32,))
        with pltpu.force_tpu_interpret_mode():
            g_with, _ = critic_grad_pallas(
                pd, pack_h0(clean, noisy), pack_h0(fake, noisy), eps,
                LossConfig(gp_weight=10.0), block_rows=32)
            g_without, _ = critic_grad_pallas(
                pd, pack_h0(clean, noisy), pack_h0(fake, noisy), eps,
                LossConfig(gp_weight=0.0), block_rows=32)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_with, g_without)
        assert max(jax.tree_util.tree_leaves(d)) > 1e-4


class TestFusedTrainStep:
    def test_train_step_parity(self):
        """Full outer step fused vs unfused: same keys -> same trajectory
        (the fused path is the identical stochastic function)."""
        from ofdmgan_tpu.signal import DatagenConfig
        from ofdmgan_tpu.training import TrainState, make_adam, make_train_step

        gen, critic = MiniGenerator(), MiniDiscriminator()
        x0 = jnp.zeros((1, 16, 2))
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
        state0 = TrainState.create(gen.init(KEY, x0), critic.init(KEY, x0, x0),
                                   tx_g, tx_d)
        dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        cfg = LossConfig(n_critic=2)
        kw = dict(batch_size=32, donate=False)
        step_ref = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, cfg, **kw)
        step_fused = make_train_step(gen.apply, critic.apply, tx_g, tx_d, dg, cfg,
                                     use_pallas_critic=True, pallas_interpret=True,
                                     **kw)
        sr, sf = state0, state0
        for i in range(2):
            k = jax.random.fold_in(KEY, 10 + i)
            sr, mr = step_ref(sr, k)
            sf, mf = step_fused(sf, k)
        for name in mr:
            np.testing.assert_allclose(float(mf[name]), float(mr[name]),
                                       rtol=5e-4, atol=1e-5, err_msg=name)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), sr.params_d, sf.params_d)
        assert max(jax.tree_util.tree_leaves(d)) < 1e-5
