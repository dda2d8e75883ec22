"""Cross-language cosimulation: the JAX integer datapath (quant/intsim.py)
must agree BIT-FOR-BIT with the independent native C++ engine
(native/fixsim.cpp) on random weights and inputs — the rebuild's equivalent
of Python<->iverilog golden testing (SURVEY.md §4.5-4.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
from ofdmgan_tpu.quant import intsim
from ofdmgan_tpu.quant.rom_codegen import pack_rom_arrays
from ofdmgan_tpu.verify import cosim

pytestmark = pytest.mark.skipif(not cosim.available(), reason="native build failed")

KEY = jax.random.PRNGKey(0)


def _gen_setup(seed=0):
    gen = MiniGenerator()
    p = jax.device_get(gen.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 2))))
    ip = intsim.quantize_weights_rtl(p, "generator")
    rom_w, rom_b = pack_rom_arrays(gen_params=p)
    return ip, rom_w, rom_b


def _disc_setup(seed=0):
    disc = MiniDiscriminator()
    x0 = jnp.zeros((1, 16, 2))
    p = jax.device_get(disc.init(jax.random.PRNGKey(seed), x0, x0))
    ip = intsim.quantize_weights_rtl(p, "discriminator")
    rom_w, rom_b = pack_rom_arrays(disc_params=p)
    return ip, rom_w, rom_b


class TestGeneratorCosim:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bit_exact_random_frames(self, seed):
        ip, rom_w, rom_b = _gen_setup(seed)
        x = jax.random.normal(jax.random.PRNGKey(100 + seed), (32, 16, 2)) * 1.5
        xq = intsim.float_to_q88(x)  # [N, L, 2]
        y_jax = np.asarray(intsim.generator_int_forward(ip, xq, "rtl"))
        # native expects channel-major [N, 2, 16]
        x_ncl = np.swapaxes(np.asarray(xq, np.int16), 1, 2)
        y_native = cosim.generator_forward(rom_w, rom_b, x_ncl)
        np.testing.assert_array_equal(np.swapaxes(y_jax, 1, 2).astype(np.int16), y_native)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_residual_mode_bit_exact(self, seed):
        """rtl_residual: RTL datapath with the clamp-tanh replaced by a
        saturating input add — JAX and C++ must agree bit-for-bit, and the
        result must differ from plain rtl (the stage actually changed)."""
        ip, rom_w, rom_b = _gen_setup(seed)
        x = jax.random.normal(jax.random.PRNGKey(200 + seed), (32, 16, 2)) * 1.5
        xq = intsim.float_to_q88(x)
        y_jax = np.asarray(intsim.generator_int_forward(ip, xq, "rtl_residual"))
        x_ncl = np.swapaxes(np.asarray(xq, np.int16), 1, 2)
        y_native = cosim.generator_forward(rom_w, rom_b, x_ncl, residual=True)
        np.testing.assert_array_equal(np.swapaxes(y_jax, 1, 2).astype(np.int16), y_native)
        y_rtl = np.asarray(intsim.generator_int_forward(ip, xq, "rtl"))
        assert not np.array_equal(y_jax, y_rtl)
        # saturating-add extremes
        patterns = np.stack([
            np.full((16, 2), 32767, np.int16),
            np.full((16, 2), -32768, np.int16),
        ])
        y_j = np.asarray(intsim.generator_int_forward(
            ip, jnp.asarray(patterns, jnp.int32), "rtl_residual"))
        y_n = cosim.generator_forward(rom_w, rom_b, np.swapaxes(patterns, 1, 2),
                                      residual=True)
        np.testing.assert_array_equal(np.swapaxes(y_j, 1, 2).astype(np.int16), y_n)

    def test_extreme_inputs_saturate_identically(self):
        ip, rom_w, rom_b = _gen_setup()
        patterns = np.stack([
            np.full((16, 2), 32767, np.int16),
            np.full((16, 2), -32768, np.int16),
            np.zeros((16, 2), np.int16),
            np.tile(np.asarray([[256, -256]], np.int16), (16, 1)),
        ])
        y_jax = np.asarray(intsim.generator_int_forward(ip, jnp.asarray(patterns, jnp.int32), "rtl"))
        y_native = cosim.generator_forward(rom_w, rom_b, np.swapaxes(patterns, 1, 2))
        np.testing.assert_array_equal(np.swapaxes(y_jax, 1, 2).astype(np.int16), y_native)


class TestDiscriminatorCosim:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_bit_exact_scores(self, seed):
        ip, rom_w, rom_b = _disc_setup(seed)
        cand = intsim.float_to_q88(jax.random.normal(jax.random.PRNGKey(7 + seed), (16, 16, 2)))
        cond = intsim.float_to_q88(jax.random.normal(jax.random.PRNGKey(8 + seed), (16, 16, 2)))
        s_jax = np.asarray(intsim.discriminator_int_forward(ip, cand, cond, "rtl"))[:, 0]
        s_native = cosim.discriminator_forward(
            rom_w, rom_b,
            np.swapaxes(np.asarray(cand, np.int16), 1, 2),
            np.swapaxes(np.asarray(cond, np.int16), 1, 2),
        )
        np.testing.assert_array_equal(s_jax.astype(np.int16), s_native)


class TestRtlScenarios:
    """Signal-level scenario tests mirroring tb_cwgan_gp_full.v:447-586 —
    impaired OFDM frames through the integer datapath, checking the engine
    stays bit-identical across languages under realistic stimuli."""

    @pytest.mark.parametrize("scenario", ["awgn30", "deep_fade", "burst"])
    def test_scenarios(self, scenario):
        from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch

        ip, rom_w, rom_b = _gen_setup()
        cfg = DatagenConfig.make(frame_length=16, snr_range=(5, 15))
        batch = synthetic_batch(jax.random.PRNGKey(42), 8, cfg)
        noisy = np.array(batch["noisy"])  # writable copy
        if scenario == "deep_fade":
            noisy[:, 4:8, :] *= 0.4
        elif scenario == "burst":
            noisy[:, 8:12, :] += 0.8 * np.random.default_rng(0).standard_normal((8, 4, 2))
        xq = intsim.float_to_q88(jnp.asarray(noisy))
        y_jax = np.asarray(intsim.generator_int_forward(ip, xq, "rtl"))
        y_native = cosim.generator_forward(
            rom_w, rom_b, np.swapaxes(np.asarray(xq, np.int16), 1, 2)
        )
        np.testing.assert_array_equal(np.swapaxes(y_jax, 1, 2).astype(np.int16), y_native)
