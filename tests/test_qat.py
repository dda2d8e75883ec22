"""Q1.7/Q8.8 quantization-aware training tests: STE semantics, constrained
weights, and the payoff — QAT-trained params survive the integer datapath
with small error."""

import numpy as np
import jax
import jax.numpy as jnp

from ofdmgan_tpu.models import MiniGenerator
from ofdmgan_tpu.models.generator import q17_ste, q88_ste
from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.training import LossConfig, TrainState, make_adam, make_train_step
from ofdmgan_tpu.quant import intsim

KEY = jax.random.PRNGKey(0)


class TestSTE:
    def test_q17_forward_values(self):
        w = jnp.asarray([0.5, -0.5, 1.5, -1.5, 1 / 256])
        q = q17_ste(w)
        np.testing.assert_allclose(
            np.asarray(q), [0.5, -0.5, 127 / 128, -1.0, 0.0], atol=1e-7
        )

    def test_identity_gradient(self):
        g = jax.grad(lambda w: jnp.sum(q17_ste(w)))(jnp.asarray([0.3, 2.0, -3.0]))
        np.testing.assert_allclose(np.asarray(g), 1.0)
        g2 = jax.grad(lambda x: jnp.sum(q88_ste(x)))(jnp.asarray([0.123, -4.5]))
        np.testing.assert_allclose(np.asarray(g2), 1.0)

    def test_qat_model_param_count_unchanged(self):
        from ofdmgan_tpu.models import count_parameters

        m = MiniGenerator(qat=True)
        p = m.init(KEY, jnp.zeros((1, 16, 2)))
        assert count_parameters(p) == 258


class TestQATPayoff:
    def test_qat_training_keeps_int_path_faithful(self):
        """Train briefly with QAT; the float-QAT forward and the float_ref
        integer datapath must then agree closely (the whole point)."""
        gen_qat = MiniGenerator(qat=True)
        critic_x = jnp.zeros((1, 16, 2))
        from ofdmgan_tpu.models import MiniDiscriminator

        critic = MiniDiscriminator()
        pg = gen_qat.init(KEY, critic_x)
        pd = critic.init(KEY, critic_x, critic_x)
        tx_g, tx_d = make_adam(1e-3), make_adam(1e-3)
        state = TrainState.create(pg, pd, tx_g, tx_d)
        dg = DatagenConfig.make()
        step = make_train_step(gen_qat.apply, critic.apply, tx_g, tx_d, dg,
                               LossConfig(n_critic=2), 256, scan_steps=50,
                               donate=False)
        for i in range(3):
            state, m = step(state, jax.random.fold_in(KEY, i))
        assert np.isfinite(float(m["rec_loss"]))

        params = jax.device_get(state.params_g)
        # all weights inside the Q1.7 representable range after QAT clipping
        import flax

        flat = flax.traverse_util.flatten_dict(params["params"])
        for k, v in flat.items():
            if "kernel" in k[-1]:
                assert float(np.abs(v).max()) <= 1.5, (k, float(np.abs(v).max()))

        x = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (64, 16, 2))
        y_float = np.asarray(gen_qat.apply(state.params_g, x))
        ip = intsim.quantize_weights_rtl(params, "generator")
        y_int = np.asarray(
            intsim.q88_to_float(
                intsim.generator_int_forward(ip, intsim.float_to_q88(x), "float_ref")
            )
        )
        err = np.abs(y_int - y_float).max()
        assert err < 0.12, err  # integer path faithful to the QAT model
