"""Pipeline parallelism (pp axis): the GPipe-style 2-stage U-Net pipeline
must reproduce the single-device supervised update to float tolerance —
the backward schedule is jax.grad through the scan-of-ppermute forward, so
this equivalence exercises both directions of the inter-stage ICI traffic."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ofdmgan_tpu.models.full_unet import FullUNetGenerator
from ofdmgan_tpu.parallel import make_mesh, make_pp_supervised_train_step
from ofdmgan_tpu.parallel.pipeline import unet_stage_fns
from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.signal.datagen import synthetic_batch
from ofdmgan_tpu.training import make_adam

KEY = jax.random.PRNGKey(0)
L = 64
GEN = FullUNetGenerator(frame_length=L, levels=3, base_channels=8)
CFG = DatagenConfig.make(frame_length=L, snr_range=(0, 30), nonlinear=True)


def _init():
    params = GEN.init(KEY, jnp.zeros((1, L, 2)))
    tx = make_adam(1e-4)
    return params, tx, tx.init(params)


def _ref_step(params, tx, opt, key, batch_size):
    batch = synthetic_batch(key, batch_size, CFG)

    def loss_fn(p):
        return jnp.mean(jnp.abs(GEN.apply(p, batch["noisy"]) - batch["clean"]))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss


class TestPipeline:
    def test_stage_composition_matches_call(self):
        params, _, _ = _init()
        stages, width = unet_stage_fns(GEN, L)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(4, L, 2)),
                        jnp.float32)
        buf = jnp.pad(x.reshape(4, -1), ((0, 0), (0, width - 2 * L)))
        out = stages[1](params, stages[0](params, buf))
        y = out[:, :2 * L].reshape(4, L, 2)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(GEN.apply(params, x)),
                                   atol=1e-6)

    @pytest.mark.parametrize("remat", [False, True])
    def test_pp_matches_single_device_update(self, remat):
        # SGD so the param delta is LINEAR in the gradient delta — an Adam
        # step-1 comparison amplifies f32 reduction-order noise through the
        # g/|g| normalization and says nothing about pipeline correctness.
        params = GEN.init(KEY, jnp.zeros((1, L, 2)))
        tx = optax.sgd(1e-2)
        opt = tx.init(params)
        mesh = make_mesh({"pp": 2})
        step = make_pp_supervised_train_step(
            GEN, tx, CFG, global_batch_size=16, microbatches=4, mesh=mesh,
            remat=remat)
        k = jax.random.PRNGKey(5)
        (pp_params, _), metrics = step((params, opt), k)
        ref_params, _, ref_loss = _ref_step(params, tx, opt, k, 16)
        np.testing.assert_allclose(float(metrics["rec_loss"]),
                                   float(ref_loss), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(pp_params)),
                        jax.tree_util.tree_leaves(jax.device_get(ref_params))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_pp_multi_step_trains(self):
        params, tx, opt = _init()
        mesh = make_mesh({"pp": 2})
        step = make_pp_supervised_train_step(
            GEN, tx, CFG, global_batch_size=16, microbatches=2, mesh=mesh)
        state = (params, opt)
        losses = []
        for i in range(3):
            state, m = step(state, jax.random.PRNGKey(100 + i))
            losses.append(float(m["rec_loss"]))
        assert all(np.isfinite(l) for l in losses), losses

    def test_pp_mesh_size_must_match_stages(self):
        params, tx, opt = _init()
        mesh = make_mesh({"pp": 4})
        with pytest.raises(ValueError, match="stages"):
            make_pp_supervised_train_step(
                GEN, tx, CFG, global_batch_size=16, microbatches=4, mesh=mesh)
