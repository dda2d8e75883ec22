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
