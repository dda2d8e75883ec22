"""End-to-end packed training step (ops/packed_step.py): exact numerical
parity with the unpacked fused step on the identical PRNG stream.

The packed step is the round-3 answer to the 34.6 ns/frame non-matmul floor
(results/RESULTS.md §Perf analysis): p frames per 128-lane row, block-
diagonal matmuls, data born packed in the datagen. It must compute the
SAME stochastic function as training/wgan_gp.build_train_step — these tests
pin that, so the benchmark numbers need no separate stability validation
beyond the float-reassociation tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.critic import compute_gradient_penalty
from ofdmgan_tpu.ops.packed_step import (
    build_packed_train_step, packed_critic_forward, packed_gen_forward,
    packed_gradient_penalty, packed_synthetic_batch,
)
from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch
from ofdmgan_tpu.training import LossConfig, TrainState, make_adam
from ofdmgan_tpu.training.wgan_gp import build_train_step

B, P, L = 32, 4, 16


def _packed(x):
    return np.asarray(x).reshape(B // P, -1)


def _params():
    key = jax.random.PRNGKey(0)
    gen, critic = MiniGenerator(), MiniDiscriminator()
    x0 = jnp.zeros((1, L, 2), jnp.float32)
    return gen, critic, gen.init(key, x0), critic.init(key, x0, x0)


class TestDatagenParity:
    @pytest.mark.parametrize("nonlinear", [False, True])
    def test_identical_prng_stream(self, nonlinear):
        cfg = DatagenConfig.make(frame_length=L, snr_range=(0, 30),
                                 nonlinear=nonlinear, pa_saturation=0.8)
        key = jax.random.PRNGKey(3)
        ref = synthetic_batch(key, B, cfg)
        got = packed_synthetic_batch(key, B, P, cfg)
        np.testing.assert_allclose(_packed(ref["noisy"]), np.asarray(got["noisy"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(_packed(ref["clean"]), np.asarray(got["clean"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref["snr"]).reshape(B // P, P),
                                   np.asarray(got["snr"]), rtol=1e-6)


class TestForwardParity:
    def test_generator(self):
        gen, _, pg, _ = _params()
        x = jax.random.normal(jax.random.PRNGKey(1), (B, L, 2))
        ref = gen.apply(pg, x)
        got = packed_gen_forward(pg, jnp.asarray(_packed(x)), P)
        np.testing.assert_allclose(_packed(ref), np.asarray(got), atol=2e-6)

    def test_generator_residual(self):
        gen = MiniGenerator(input_residual=True)
        pg = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, L, 2)))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, L, 2))
        ref = gen.apply(pg, x)
        got = packed_gen_forward(pg, jnp.asarray(_packed(x)), P,
                                 input_residual=True)
        np.testing.assert_allclose(_packed(ref), np.asarray(got), atol=2e-6)

    def test_critic(self):
        _, critic, _, pd = _params()
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        cand = jax.random.normal(k1, (B, L, 2))
        cond = jax.random.normal(k2, (B, L, 2))
        ref = critic.apply(pd, cand, cond)  # [B, 1]
        got = packed_critic_forward(pd, jnp.asarray(_packed(cand)),
                                    jnp.asarray(_packed(cond)), P)  # [R, p]
        np.testing.assert_allclose(np.asarray(ref).reshape(B // P, P),
                                   np.asarray(got), atol=2e-5)

    def test_gradient_penalty(self):
        gen, critic, pg, pd = _params()
        k1, k2, kgp = jax.random.split(jax.random.PRNGKey(4), 3)
        real = jax.random.normal(k1, (B, L, 2))
        cond = jax.random.normal(k2, (B, L, 2))
        fake = gen.apply(pg, cond)
        ref = compute_gradient_penalty(critic.apply, pd, real, fake, cond, kgp)
        got = packed_gradient_penalty(pd, jnp.asarray(_packed(real)),
                                      jnp.asarray(_packed(fake)),
                                      jnp.asarray(_packed(cond)), kgp, P, L)
        np.testing.assert_allclose(float(ref), float(got), rtol=2e-4)


class TestStepParity:
    @pytest.mark.parametrize("nonlinear", [False, True])
    def test_train_step_lockstep(self, nonlinear):
        """Several full steps (datagen + 5 critic updates with GP + gen
        update, Adam) must track the unpacked step to float tolerance."""
        gen, critic, pg, pd = _params()
        cfg = DatagenConfig.make(frame_length=L, snr_range=(0, 30),
                                 nonlinear=nonlinear, pa_saturation=0.8)
        loss_cfg = LossConfig(n_critic=5)
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)

        ref_step = jax.jit(build_train_step(
            gen.apply, critic.apply, tx_g, tx_d, cfg, loss_cfg, B))
        packed_step = jax.jit(build_packed_train_step(
            tx_g, tx_d, cfg, loss_cfg, B, p=P,
            matmul_precision="float32"))

        s_ref = TrainState.create(pg, pd, tx_g, tx_d)
        s_pk = TrainState.create(pg, pd, tx_g, tx_d)
        for i in range(3):
            k = jax.random.fold_in(jax.random.PRNGKey(7), i)
            s_ref, m_ref = ref_step(s_ref, k)
            s_pk, m_pk = packed_step(s_pk, k)
        for name in ("d_loss", "g_loss", "rec_loss", "gradient_penalty",
                     "wasserstein_distance"):
            np.testing.assert_allclose(float(m_ref[name]), float(m_pk[name]),
                                       rtol=2e-3, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref.params_g),
                        jax.tree_util.tree_leaves(s_pk.params_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref.params_d),
                        jax.tree_util.tree_leaves(s_pk.params_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-5)

    def test_bf16_storage_mixed_precision(self):
        """act_dtype=bfloat16 + bf16_tf32gp packed step tracks the unpacked
        bf16-storage step's trajectory (same PRNG stream; bf16 rounding and
        reassociation differ, so loose tolerance)."""
        gen, critic, pg, pd = _params()
        gen16 = MiniGenerator(act_dtype="bfloat16")
        critic16 = MiniDiscriminator(act_dtype="bfloat16")
        cfg = DatagenConfig.make(frame_length=L, snr_range=(0, 30))
        loss_cfg = LossConfig(n_critic=5)
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
        ref_step = jax.jit(build_train_step(
            gen16.apply, critic16.apply, tx_g, tx_d, cfg, loss_cfg, B,
            matmul_precision="bf16_tf32gp", act_dtype="bfloat16"))
        packed_step = jax.jit(build_packed_train_step(
            tx_g, tx_d, cfg, loss_cfg, B, p=P,
            matmul_precision="bf16_tf32gp", act_dtype="bfloat16",
            critic_unroll=5))
        s_ref = TrainState.create(pg, pd, tx_g, tx_d)
        s_pk = TrainState.create(pg, pd, tx_g, tx_d)
        for i in range(3):
            k = jax.random.fold_in(jax.random.PRNGKey(7), i)
            s_ref, m_ref = ref_step(s_ref, k)
            s_pk, m_pk = packed_step(s_pk, k)
        for name in ("d_loss", "g_loss", "rec_loss", "gradient_penalty"):
            a, b = float(m_ref[name]), float(m_pk[name])
            assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (name, a, b)

    def test_scan_steps_and_p2(self):
        gen, critic, pg, pd = _params()
        cfg = DatagenConfig.make(frame_length=L, snr_range=(0, 30))
        tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
        step = jax.jit(build_packed_train_step(
            tx_g, tx_d, cfg, LossConfig(n_critic=2), B, p=2, scan_steps=3,
            matmul_precision="float32"))
        s = TrainState.create(pg, pd, tx_g, tx_d)
        s, m = step(s, jax.random.PRNGKey(0))
        assert int(s.step) == 3
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))
