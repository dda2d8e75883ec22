"""Serving forward (models/unet_infer.py) vs the training forward.

The fused upsample+conv decoder must be numerically equivalent to
FullUNetGenerator's materialized upsample -> conv(k=3) pipeline on the
same param tree (reference topology: export/generator/metadata.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdmgan_tpu.models.full_unet import FullUNetGenerator
from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply


@pytest.fixture(scope="module")
def small_unet():
    model = FullUNetGenerator(frame_length=64, levels=3, base_channels=8)
    key = jax.random.PRNGKey(7)
    params = model.init(key, jnp.zeros((1, 64, 2), jnp.float32))
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 64, 2), jnp.float32)
    return model, params, x


def test_unfused_f32_bit_exact(small_unet):
    """fused_decoder=False + f32 reproduces the training forward exactly."""
    model, params, x = small_unet
    ref = model.apply(params, x)
    apply = make_unet_infer_apply(levels=3, act_dtype=jnp.float32,
                                  fused_decoder=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(apply(params, x)))


def test_fused_decoder_equivalence(small_unet):
    """Fused k=2 pair == upsample+conv(k=3) up to one-reassociation eps."""
    model, params, x = small_unet
    ref = model.apply(params, x)
    apply = make_unet_infer_apply(levels=3, act_dtype=jnp.float32,
                                  fused_decoder=True)
    out = apply(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=1e-5)


def test_fused_decoder_bf16_close(small_unet):
    """bf16 serving storage stays within bf16 rounding of the f32 forward
    (outputs are tanh-bounded so atol is the meaningful scale)."""
    model, params, x = small_unet
    ref = np.asarray(model.apply(params, x))
    params_bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    apply = make_unet_infer_apply(levels=3, act_dtype=jnp.bfloat16)
    out = np.asarray(apply(params_bf16, x).astype(jnp.float32))
    assert np.max(np.abs(ref - out)) < 0.05
    assert np.mean(np.abs(ref - out)) < 5e-3


def test_fused_decoder_full_scale_shape():
    """Full production config: shapes + finiteness at L=1024, 5 levels."""
    model = FullUNetGenerator()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 1024, 2), jnp.float32))
    apply = make_unet_infer_apply()
    x = jax.random.normal(key, (2, 1024, 2), jnp.float32)
    y = jax.jit(apply)(jax.tree.map(lambda p: p.astype(jnp.bfloat16), params), x)
    assert y.shape == (2, 1024, 2)
    assert bool(jnp.isfinite(y).all())


def test_fused_decoder_training_gradients_equivalent(small_unet):
    """Round 5: the fused decoder is the TRAINING forward too
    (train.py --fused_decoder). The identity is exact, so gradients of a
    supervised loss through the fused apply must match gradients through
    the flax module to reassociation eps."""
    model, params, x = small_unet
    target = jnp.tanh(x * 0.5)
    fused = make_unet_infer_apply(levels=3, act_dtype=jnp.float32,
                                  fused_decoder=True)

    def loss_ref(p):
        return jnp.mean(jnp.abs(model.apply(p, x) - target))

    def loss_fused(p):
        return jnp.mean(jnp.abs(fused(p, x) - target))

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_fused_decoder_trains_a_step(small_unet):
    """One fused WGAN-GP step through the fused training forward: finite
    losses, params move (the trainer wiring path, Trainer(fused_decoder=
    True))."""
    from ofdmgan_tpu.models.full_unet import FullDiscriminator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import (LossConfig, TrainState, make_adam,
                                      make_train_step)

    model, params, x = small_unet
    critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
    key = jax.random.PRNGKey(0)
    params_d = critic.init(key, x[:1], x[:1])
    tx_g, tx_d = make_adam(1e-4), make_adam(1e-4)
    state = TrainState.create(params, params_d, tx_g, tx_d)
    fused = make_unet_infer_apply(levels=3, act_dtype=jnp.float32,
                                  fused_decoder=True)
    dg = DatagenConfig.make(frame_length=64, snr_range=(0, 30))
    step = make_train_step(fused, critic.apply, tx_g, tx_d, dg,
                           LossConfig(n_critic=2), batch_size=8,
                           scan_steps=1, donate=False)
    new_state, m = step(state, key)
    for name in ("d_loss", "g_loss", "gradient_penalty"):
        assert np.isfinite(float(m[name])), name
    before = np.concatenate([np.ravel(l) for l in
                             jax.tree_util.tree_leaves(state.params_g)])
    after = np.concatenate([np.ravel(l) for l in
                            jax.tree_util.tree_leaves(new_state.params_g)])
    assert not np.array_equal(before, after)


def test_full_critic_apply_parity(small_unet):
    """make_full_critic_apply == FullDiscriminator.apply at f32 (exact up
    to pool-order), close at bf16 storage."""
    from ofdmgan_tpu.models.full_unet import FullDiscriminator
    from ofdmgan_tpu.models.unet_infer import make_full_critic_apply

    model, params, x = small_unet
    critic = FullDiscriminator(frame_length=64, levels=3, base_channels=8)
    key = jax.random.PRNGKey(11)
    pd = critic.init(key, x[:1], x[:1])
    cond = jax.random.normal(jax.random.fold_in(key, 2), x.shape, jnp.float32)
    ref = np.asarray(critic.apply(pd, x, cond))

    f32 = make_full_critic_apply(levels=3, act_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f32(pd, x, cond)), ref,
                               rtol=1e-6, atol=1e-6)

    b16 = make_full_critic_apply(levels=3, act_dtype=jnp.bfloat16)
    out = np.asarray(b16(pd, x, cond))
    # critic scores are O(1-10); bf16 operand rounding through 3 conv
    # levels + f32 pool stays within ~1%
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.2)
