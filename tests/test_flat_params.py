"""bench.py --flat_params parity: training on raveled parameter vectors.

The r5 perf lever trains on ONE f32 vector per net (ravel_pytree), with the
tree rebuilt by static slices inside the premap. Math-level the trajectory
is identical: unravel is value-preserving, slice VJPs write disjoint spans
of the cotangent vector, and Adam is elementwise. MEASURED equivalence
class: f32-ulp (XLA fuses the elementwise chains differently around the
vector, so FMA contraction flips low bits — after 3 full WGAN-GP steps the
worst parameter delta is ~4e-9, 1 element in ~800). That is the same
rounding class as an XLA version bump, not a precision change; the tests
pin the trajectory to atol 1e-6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.models.flat import (make_critic_flat_parts,
                                     make_generator_flat_parts)
from ofdmgan_tpu.ops import dense_conv
from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.signal.datagen import synthetic_batch_flat
from ofdmgan_tpu.training import (LossConfig, TrainState, make_adam,
                                  make_train_step)


@pytest.fixture
def setup():
    old = dense_conv.CONV_EXPAND
    dense_conv.CONV_EXPAND = "onehot"
    yield
    dense_conv.CONV_EXPAND = old


def _run(n_steps, flat_params, setup_key=0):
    key = jax.random.PRNGKey(setup_key)
    gen = MiniGenerator(act_dtype="bfloat16")
    critic = MiniDiscriminator(act_dtype="bfloat16")
    x0 = jnp.zeros((1, 16, 2), jnp.float32)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    params_g = gen.init(key, x0)
    params_d = critic.init(key, x0, x0)

    gpre, gapply = make_generator_flat_parts(act_dtype="bfloat16")
    cpre, capply = make_critic_flat_parts(act_dtype="bfloat16")
    _, capply_gp = make_critic_flat_parts(act_dtype="bfloat16", mm="tf32x3")
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))

    unravel_g = unravel_d = None
    if flat_params:
        pg_vec, unravel_g = ravel_pytree(params_g)
        pd_vec, unravel_d = ravel_pytree(params_d)
        state = TrainState.create(pg_vec, pd_vec, tx_g, tx_d)
        gpre_w = lambda v: gpre(unravel_g(v))
        cpre_w = lambda v: cpre(unravel_d(v))
    else:
        state = TrainState.create(params_g, params_d, tx_g, tx_d)
        gpre_w, cpre_w = gpre, cpre

    step = make_train_step(
        gapply, capply, tx_g, tx_d, dg, LossConfig(),
        batch_size=64, scan_steps=2, matmul_precision="bf16_tf32gp",
        act_dtype="bfloat16", critic_unroll=5, donate=False,
        batch_fn=lambda k, n: synthetic_batch_flat(k, n, dg),
        critic_apply_gp=capply_gp, outer_unroll=2,
        gen_premap=gpre_w, critic_premap=cpre_w,
    )
    metrics = []
    for s in range(n_steps):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(7), s))
        metrics.append(jax.device_get(m))
    pg = state.params_g if not flat_params else unravel_g(state.params_g)
    pd = state.params_d if not flat_params else unravel_d(state.params_d)
    return jax.device_get(pg), jax.device_get(pd), metrics


def test_flat_params_trajectory_ulp_equivalent(setup):
    pg_t, pd_t, m_t = _run(3, flat_params=False)
    pg_f, pd_f, m_f = _run(3, flat_params=True)
    for a, b in zip(jax.tree_util.tree_leaves(pg_t),
                    jax.tree_util.tree_leaves(pg_f)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pd_t),
                    jax.tree_util.tree_leaves(pd_f)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    for mt, mf in zip(m_t, m_f):
        for k in ("d_loss", "g_loss", "gradient_penalty"):
            np.testing.assert_allclose(np.asarray(mt[k]), np.asarray(mf[k]),
                                       rtol=1e-4)


def test_ravel_roundtrip_is_identity():
    key = jax.random.PRNGKey(3)
    gen = MiniGenerator()
    params = gen.init(key, jnp.zeros((1, 16, 2), jnp.float32))
    vec, unravel = ravel_pytree(params)
    back = unravel(vec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
