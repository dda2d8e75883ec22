"""Model contract tests, mirroring the reference's test_models.py:10-191 and
proof/verification.py architecture checks: shapes, parameter budgets, channel
progression, output range, gradient flow, plus matmul-vs-conv lowering
equivalence (new: the two MXU lowerings must agree bitwise-tightly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models import (
    MiniGenerator,
    MiniDiscriminator,
    compute_gradient_penalty,
    count_parameters,
)
from ofdmgan_tpu.ops.dense_conv import (
    conv1d_dense_matrix,
    conv1d_via_matmul,
    upsample_nearest_2x,
)

KEY = jax.random.PRNGKey(0)


class TestDenseConvLowering:
    @pytest.mark.parametrize("l,cin,cout,k,s,p", [
        (16, 2, 4, 3, 2, 1),
        (8, 4, 8, 3, 2, 1),
        (8, 8, 4, 3, 1, 1),
        (16, 4, 2, 3, 1, 1),
        (16, 4, 2, 1, 1, 0),
        (12, 3, 5, 5, 2, 2),
    ])
    def test_matches_lax_conv(self, l, cin, cout, k, s, p):
        kw, kx = jax.random.split(KEY)
        w = jax.random.normal(kw, (k, cin, cout))
        x = jax.random.normal(kx, (3, l, cin))
        b = jnp.arange(cout, dtype=jnp.float32) * 0.1
        got = conv1d_via_matmul(x, w, b, s, p)
        # lax reference: NWC / WIO
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(s,), padding=[(p, p)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_dense_matrix_grad_flows_to_kernel(self):
        w = jax.random.normal(KEY, (3, 2, 4))
        f = lambda w_: jnp.sum(conv1d_dense_matrix(w_, 16, 2, 1) ** 2)
        g = jax.grad(f)(w)
        assert float(jnp.abs(g).sum()) > 0

    @pytest.mark.parametrize("l,cin,cout,k,s,p", [
        (16, 2, 4, 3, 2, 1),
        (8, 4, 8, 3, 2, 1),
        (8, 8, 4, 3, 1, 1),
        (16, 4, 2, 3, 1, 1),
        (16, 4, 2, 1, 1, 0),
        (12, 3, 5, 5, 2, 2),
    ])
    def test_onehot_expansion_bit_exact(self, l, cin, cout, k, s, p):
        """The 'onehot' Toeplitz expansion (constant 0/1 placement tensor,
        no scatter-add in the backward — the scatter is 9.3% of on-chip
        step time, results/op_table_r3_headline.json) must be BIT-exact
        vs the 'dus' chain: each output cell has exactly one nonzero
        placement, so the multiply-reduce sums one real term + exact
        zeros. Gradients (incl. second order, which the GP chain needs)
        must match to f32 reduction-order tolerance."""
        from ofdmgan_tpu.ops import dense_conv

        kw = jax.random.split(KEY, 2)[0]
        w = jax.random.normal(kw, (k, cin, cout))

        def expand(w_, impl):
            old = dense_conv.CONV_EXPAND
            dense_conv.CONV_EXPAND = impl
            try:
                return dense_conv.conv1d_dense_matrix(w_, l, s, p)
            finally:
                dense_conv.CONV_EXPAND = old

        a_dus = expand(w, "dus")
        a_oh = expand(w, "onehot")
        np.testing.assert_array_equal(np.asarray(a_dus), np.asarray(a_oh))

        g = lambda impl: jax.grad(
            lambda w_: jnp.sum(jnp.tanh(expand(w_, impl)) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g("dus")),
                                   np.asarray(g("onehot")), rtol=1e-6)

        gg = lambda impl: jax.grad(lambda w_: jnp.sum(jax.grad(
            lambda v: jnp.sum(jnp.tanh(expand(v, impl)) ** 2))(w_) ** 2))(w)
        np.testing.assert_allclose(np.asarray(gg("dus")),
                                   np.asarray(gg("onehot")), rtol=1e-6)

    def test_upsample(self):
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
        y = upsample_nearest_2x(x)
        np.testing.assert_array_equal(
            np.asarray(y[0, :, 0]), [0, 0, 2, 2, 4, 4]
        )


class TestGenerator:
    def test_forward_shape_and_range(self):
        model = MiniGenerator()
        x = jax.random.normal(KEY, (4, 16, 2))
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (4, 16, 2)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh output

    def test_parameter_count_contract(self):
        # Exact RTL contract: 258 params (proof/verification.py:60).
        model = MiniGenerator()
        params = model.init(KEY, jnp.zeros((1, 16, 2)))
        assert count_parameters(params) == 258

    def test_macs_estimate(self):
        assert MiniGenerator().estimate_macs() == 1728

    def test_lowering_equivalence(self):
        x = jax.random.normal(KEY, (5, 16, 2))
        m_mat = MiniGenerator(use_matmul=True)
        m_conv = MiniGenerator(use_matmul=False)
        params = m_mat.init(KEY, x)
        # conv lowering reuses the same param tree: map names.
        y_mat = m_mat.apply(params, x)
        # Rebuild params for conv impl with identical values:
        p2 = m_conv.init(KEY, x)
        p2 = _copy_params_matmul_to_conv(params, p2)
        y_conv = m_conv.apply(p2, x)
        np.testing.assert_allclose(np.asarray(y_mat), np.asarray(y_conv), atol=1e-5)

    def test_input_residual_head(self):
        """Opt-in y = x + f(x) head: same 258-param budget, exactly contains
        the identity map (zero out-conv -> y == x), rejects rtl_faithful."""
        g = MiniGenerator(input_residual=True)
        x = jax.random.normal(KEY, (4, 16, 2))
        params = g.init(KEY, x)
        assert count_parameters(params) == 258
        inner = dict(params["params"])
        inner["out_conv_kernel"] = jnp.zeros_like(inner["out_conv_kernel"])
        inner["out_conv_bias"] = jnp.zeros_like(inner["out_conv_bias"])
        np.testing.assert_array_equal(
            np.asarray(g.apply({"params": inner}, x)), np.asarray(x))
        # rtl_faithful + residual trains the RTL-residual hardware datapath:
        # same identity-at-zero-out-conv property, unbounded output (no clamp)
        gr = MiniGenerator(input_residual=True, rtl_faithful=True, qat=False)
        pr = gr.init(KEY, x)
        assert count_parameters(pr) == 258
        innr = dict(pr["params"])
        innr["out_conv_kernel"] = jnp.zeros_like(innr["out_conv_kernel"])
        innr["out_conv_bias"] = jnp.zeros_like(innr["out_conv_bias"])
        np.testing.assert_array_equal(
            np.asarray(gr.apply({"params": innr}, x)), np.asarray(x))

    def test_zero_bias_init(self):
        params = MiniGenerator().init(KEY, jnp.zeros((1, 16, 2)))
        flat = jax.tree_util.tree_leaves_with_path(params)
        biases = [v for p, v in flat if "bias" in jax.tree_util.keystr(p)]
        assert biases and all(float(jnp.abs(b).max()) == 0.0 for b in biases)

    def test_frame_length_parametric(self):
        # The 1024-sample scaled config must instantiate (SURVEY.md §5.7).
        model = MiniGenerator(frame_length=1024)
        x = jnp.zeros((2, 1024, 2))
        params = model.init(KEY, x)
        assert model.apply(params, x).shape == (2, 1024, 2)

    def test_gradient_flow(self):
        model = MiniGenerator()
        x = jax.random.normal(KEY, (4, 16, 2))
        target = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 2))
        params = model.init(KEY, x)

        def loss(p):
            return jnp.mean(jnp.abs(model.apply(p, x) - target))

        grads = jax.grad(loss)(params)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert total > 0


def _copy_params_matmul_to_conv(matmul_params, conv_params):
    """Map matmul-impl param names (enc1/conv_kernel) onto flax nn.Conv names
    (enc1/conv/kernel)."""
    import flax

    flat_src = flax.traverse_util.flatten_dict(matmul_params["params"])
    flat_dst = flax.traverse_util.flatten_dict(conv_params["params"])
    out = {}
    for kdst in flat_dst:
        # dst like ('enc1','conv','kernel') or ('out_conv','kernel');
        # src like ('enc1','conv_kernel') or ('out_conv_kernel',)
        *scope, leaf_mod, leaf = kdst
        if leaf_mod == "dense":
            out[kdst] = flat_src[kdst]  # Dense layer: names identical.
        else:
            ksrc = tuple(scope) + (f"{leaf_mod}_{leaf}",)
            out[kdst] = flat_src[ksrc]
    return {"params": flax.traverse_util.unflatten_dict(out)}


class TestDiscriminator:
    def test_forward_shape(self):
        model = MiniDiscriminator()
        cand = jax.random.normal(KEY, (4, 16, 2))
        cond = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 2))
        params = model.init(KEY, cand, cond)
        score = model.apply(params, cand, cond)
        assert score.shape == (4, 1)

    def test_parameter_count_contract(self):
        # Exact RTL contract: 521 params (proof/verification.py:61).
        model = MiniDiscriminator()
        params = model.init(KEY, jnp.zeros((1, 16, 2)), jnp.zeros((1, 16, 2)))
        assert count_parameters(params) == 521

    def test_macs_estimate(self):
        assert MiniDiscriminator().estimate_macs() == 2384

    def test_sum_pool_not_mean(self):
        # Doubling the frame content scales pooled features additively:
        # with zero weights impossible to check, so check via linearity of
        # the pooling: score(x concat) uses sum over time. We verify by
        # comparing against a manual forward with the same params.
        import flax

        model = MiniDiscriminator(use_matmul=True)
        cand = jax.random.normal(KEY, (2, 16, 2))
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 2))
        params = model.init(KEY, cand, cond)
        p = flax.traverse_util.flatten_dict(params["params"])
        from ofdmgan_tpu.ops.dense_conv import conv1d_via_matmul
        from jax.nn import leaky_relu

        x = jnp.concatenate([cand, cond], axis=-1)
        h = leaky_relu(conv1d_via_matmul(x, p[("conv1_kernel",)], p[("conv1_bias",)], 2, 1), 0.2)
        h = leaky_relu(conv1d_via_matmul(h, p[("conv2_kernel",)], p[("conv2_bias",)], 2, 1), 0.2)
        pooled = jnp.sum(h, axis=-2)
        score = pooled @ p[("dense", "kernel")] + p[("dense", "bias")]
        np.testing.assert_allclose(
            np.asarray(model.apply(params, cand, cond)), np.asarray(score), atol=1e-5
        )

    def test_wasserstein_unbounded(self):
        # No output activation: large inputs should produce scores > 1.
        model = MiniDiscriminator()
        cand = 100.0 * jnp.ones((1, 16, 2))
        cond = 100.0 * jnp.ones((1, 16, 2))
        params = model.init(KEY, cand, cond)
        s = float(jnp.abs(model.apply(params, cand, cond))[0, 0])
        assert s > 1.0


class TestGradientPenalty:
    def test_gp_positive_finite(self):
        model = MiniDiscriminator()
        real = jax.random.normal(KEY, (8, 16, 2))
        fake = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 2))
        cond = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 2))
        params = model.init(KEY, real, cond)
        gp = compute_gradient_penalty(
            model.apply, params, real, fake, cond, jax.random.PRNGKey(3)
        )
        assert np.isfinite(float(gp)) and float(gp) >= 0

    def test_gp_differentiable_wrt_params(self):
        # The GP term must admit second-order gradients (nested grad) —
        # the core of the WGAN-GP critic update (train.py:240-253).
        model = MiniDiscriminator()
        real = jax.random.normal(KEY, (4, 16, 2))
        fake = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 2))
        cond = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 2))
        params = model.init(KEY, real, cond)

        def loss(p):
            return compute_gradient_penalty(
                model.apply, p, real, fake, cond, jax.random.PRNGKey(3)
            )

        grads = jax.grad(loss)(params)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0

    def test_gp_scale_invariance_property(self):
        # For a perfectly 1-Lipschitz linear critic the penalty would be 0;
        # for a critic scaled by c the gradient norm scales by c. Sanity-check
        # the direction: scaling critic params up increases gradient norms.
        model = MiniDiscriminator()
        real = jax.random.normal(KEY, (16, 16, 2))
        fake = real * 0.5
        cond = jnp.zeros_like(real)
        params = model.init(KEY, real, cond)
        big = jax.tree_util.tree_map(lambda p: p * 10.0, params)
        gp_small = float(compute_gradient_penalty(model.apply, params, real, fake, cond, KEY))
        gp_big = float(compute_gradient_penalty(model.apply, big, real, fake, cond, KEY))
        assert gp_big > gp_small
