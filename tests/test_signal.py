"""Unit tests for the signal layer, mirroring the reference's module
self-verification blocks (utils/ofdm_utils.py:1030-1090, utils/dataset.py:389-424)
plus numeric-oracle checks against independently-written numpy formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.signal import qam, ofdm, channel, impairments, datagen
from ofdmgan_tpu.utils.iq import complex_to_iq, iq_to_complex


KEY = jax.random.PRNGKey(0)


class TestQAM:
    @pytest.mark.parametrize("mod", ["QPSK", "QAM16", "QAM64"])
    def test_roundtrip_ber_zero(self, mod):
        b = qam.bits_per_symbol(mod)
        bits = jax.random.bernoulli(KEY, 0.5, (50 * b,)).astype(jnp.int32)
        syms = qam.modulate(bits, mod)
        rec = qam.demodulate(syms, mod)
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(rec))

    @pytest.mark.parametrize("mod", ["QPSK", "QAM16", "QAM64"])
    def test_unit_average_power(self, mod):
        c = qam.constellation(mod)
        assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-6

    def test_qpsk_constellation_order(self):
        # MSB-first map: 00->1+1j, 01->1-1j, 10->-1+1j, 11->-1-1j (all /sqrt2)
        c = qam.constellation("QPSK") * np.sqrt(2)
        np.testing.assert_allclose(c, [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], atol=1e-6)

    def test_qam16_grid_matches_meshgrid_convention(self):
        c = qam.constellation("QAM16") * np.sqrt(10)
        levels = np.array([-3, -1, 1, 3])
        i, q = np.meshgrid(levels, levels)
        np.testing.assert_allclose(c, (i + 1j * q).flatten(), atol=1e-5)

    def test_batched_modulate(self):
        bits = jax.random.bernoulli(KEY, 0.5, (3, 40)).astype(jnp.int32)
        syms = qam.modulate(bits, "QAM16")
        assert syms.shape == (3, 10)


class TestOFDM:
    def test_pilot_data_index_partition(self):
        spec = ofdm.OFDMSpec(n_subcarriers=64, cp_length=16, pilot_spacing=8)
        assert set(spec.pilot_indices) == set(range(0, 64, 8))
        assert spec.n_data_subcarriers == 64 - 8
        assert set(spec.pilot_indices) | set(spec.data_indices) == set(range(64))

    def test_roundtrip_identity_channel(self):
        spec = ofdm.OFDMSpec(n_subcarriers=16, cp_length=4, pilot_spacing=4)
        nd = spec.n_data_subcarriers
        bits = jax.random.bernoulli(KEY, 0.5, (2 * nd * 2,)).astype(jnp.int32)
        syms = qam.modulate(bits, "QPSK")  # 2 OFDM symbols worth
        sig = ofdm.modulate(syms, spec)
        assert sig.shape[-1] == 2 * spec.samples_per_symbol
        data, h = ofdm.demodulate(sig, spec)
        np.testing.assert_allclose(np.asarray(data[: syms.shape[-1]]),
                                   np.asarray(syms), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), np.ones_like(h), atol=1e-5)

    def test_ifft_scaling_matches_numpy_oracle(self):
        # Reference uses np.fft.ifft(freq) * N (ofdm_utils.py:320).
        spec = ofdm.OFDMSpec(n_subcarriers=8, cp_length=2, pilot_spacing=4)
        syms = (jnp.arange(spec.n_data_subcarriers) + 0.5).astype(jnp.complex64)
        sig = np.asarray(ofdm.modulate(syms, spec))
        freq = np.zeros(8, complex)
        freq[spec.data_indices] = np.asarray(syms)
        freq[spec.pilot_indices] = 1.0
        time = np.fft.ifft(freq) * 8
        expected = np.concatenate([time[-2:], time])
        np.testing.assert_allclose(sig, expected, atol=1e-4)

    def test_ofdm_like_frame_unit_power(self):
        kr, ki = jax.random.split(KEY)
        freq = (jax.random.normal(kr, (4096, 16)) + 1j * jax.random.normal(ki, (4096, 16))) / np.sqrt(2)
        frames = ofdm.ofdm_like_frame(freq)
        p = float(jnp.mean(jnp.abs(frames) ** 2))
        assert abs(p - 1.0) < 0.05


class TestImpairments:
    def test_rapp_small_signal_unity_gain(self):
        x = 0.01 * jnp.exp(1j * jnp.linspace(0, 3, 8))
        y = impairments.pa_rapp(x, saturation=1.0, smoothness=3.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4)

    def test_rapp_saturates(self):
        x = jnp.asarray([100.0 + 0j])
        y = impairments.pa_rapp(x, saturation=1.0, smoothness=3.0)
        assert abs(np.abs(np.asarray(y))[0] - 1.0) < 0.01

    def test_rapp_matches_oracle(self):
        a = np.linspace(0.1, 2.0, 16)
        x = a * np.exp(1j * np.linspace(-3, 3, 16))
        sat, p = 0.8, 3.0
        gain = 1.0 / np.power(1 + np.power(np.abs(x) / sat, 2 * p), 1 / (2 * p))
        expected = np.abs(x) * gain * np.exp(1j * np.angle(x))
        got = np.asarray(impairments.pa_rapp(jnp.asarray(x), sat, p))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_saleh_matches_oracle(self):
        x = np.linspace(0.1, 1.5, 8) * np.exp(1j * 0.3)
        r = np.abs(x)
        a_r = 2.1587 * r / (1 + 1.1517 * r**2)
        phi = 4.0033 * r**2 / (1 + 9.1040 * r**2)
        expected = a_r * np.exp(1j * (np.angle(x) + phi))
        got = np.asarray(impairments.pa_saleh(jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_iq_imbalance_matches_oracle(self):
        x = np.array([1 + 2j, -0.5 + 0.3j, 0.1 - 0.9j])
        g = 10 ** (1.0 / 20)
        phi = np.deg2rad(5.0)
        expected = np.real(x) + 1j * g * (np.cos(phi) * np.imag(x) + np.sin(phi) * np.real(x))
        got = np.asarray(impairments.iq_imbalance(jnp.asarray(x), 1.0, 5.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_phase_noise_preserves_amplitude(self):
        x = jnp.exp(1j * jnp.linspace(0, 5, 64))
        y = impairments.phase_noise(KEY, x, -80.0, 1e6)
        np.testing.assert_allclose(np.abs(np.asarray(y)), np.abs(np.asarray(x)), rtol=1e-5)

    def test_cfo_rotation(self):
        x = jnp.ones(8, jnp.complex64)
        y = np.asarray(impairments.cfo(x, cfo_hz=1e5, sample_rate=1e6))
        expected = np.exp(1j * 2 * np.pi * 0.1 * np.arange(8))
        np.testing.assert_allclose(y, expected, rtol=1e-5)

    def test_dc_offset(self):
        x = jnp.ones(16, jnp.complex64)
        y = np.asarray(impairments.dc_offset(x, 0.1, 0.2))
        np.testing.assert_allclose(y, 1.1 + 0.2j, rtol=1e-5)

    def test_apply_all_disabled_is_identity(self):
        cfg = impairments.ImpairmentConfig(
            pa_enabled=False, iq_enabled=False, phase_noise_enabled=False
        )
        x = jnp.asarray([1 + 1j, 2 - 1j])
        y = impairments.apply_all(KEY, x, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


class TestChannel:
    def test_awgn_empirical_snr(self):
        x = jnp.exp(1j * jnp.linspace(0, 100, 65536))
        y, info = channel.awgn(KEY, x, 10.0)
        noise = np.asarray(y - x)
        snr = 10 * np.log10(1.0 / np.mean(np.abs(noise) ** 2))
        assert abs(snr - 10.0) < 0.2

    def test_awgn_per_frame_snr_vector(self):
        x = jnp.ones((4, 4096), jnp.complex64)
        snrs = jnp.asarray([0.0, 10.0, 20.0, 30.0])
        y, info = channel.awgn(KEY, x, snrs)
        noise_p = np.mean(np.abs(np.asarray(y - x)) ** 2, axis=1)
        np.testing.assert_allclose(
            10 * np.log10(1 / noise_p), [0, 10, 20, 30], atol=0.5
        )

    def test_rayleigh_scalar_tap(self):
        x = jnp.ones((8, 256), jnp.complex64)
        y, info = channel.rayleigh(KEY, x, 60.0)
        # At 60 dB SNR y ≈ h*x: every sample in a frame equals the tap.
        h = np.asarray(info["h"])
        np.testing.assert_allclose(np.asarray(y), h[:, None] * np.ones(256), rtol=1e-2)
        # taps vary across frames
        assert np.std(np.abs(h)) > 0.01

    def test_rician_k_factor_statistics(self):
        x = jnp.ones((8192, 4), jnp.complex64)
        _, info = channel.rician(KEY, x, 60.0, k_factor=10.0)
        h = np.asarray(info["h"])
        # |h|² mean ≈ 1 and low variance for high K
        assert abs(np.mean(np.abs(h) ** 2) - 1.0) < 0.05
        assert np.var(np.abs(h) ** 2) < 0.25

    def test_multipath_cir_and_convolution(self):
        x = jnp.zeros((1, 64), jnp.complex64).at[0, 32].set(1.0)  # impulse
        y, info = channel.multipath(KEY, x, 80.0, delays=(0, 1, 2), powers=(1.0, 0.5, 0.25))
        h = np.asarray(info["h"])[0]
        # np.convolve 'same' of an impulse at 32 with 3-tap h places
        # h[0] at 31... verify against the numpy oracle directly.
        expected = np.convolve(np.asarray(x)[0], h, mode="same")
        np.testing.assert_allclose(np.asarray(y)[0], expected, atol=1e-3)


class TestDatagen:
    def test_shapes_and_normalization(self):
        cfg = datagen.DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        out = jax.jit(lambda k: datagen.synthetic_batch(k, 64, cfg))(KEY)
        assert out["noisy"].shape == (64, 16, 2)
        assert out["clean"].shape == (64, 16, 2)
        assert out["snr"].shape == (64,)
        m = np.maximum(
            np.abs(np.asarray(out["noisy"])).reshape(64, -1).max(1),
            np.abs(np.asarray(out["clean"])).reshape(64, -1).max(1),
        )
        np.testing.assert_allclose(m, 1.0, atol=1e-5)
        s = np.asarray(out["snr"])
        assert s.min() >= 0.0 and s.max() <= 30.0

    def test_clean_is_prenormalized_ofdm_frame(self):
        # Undoing the joint normalization, the clean frame must be an exact
        # IFFT*sqrt(L) of some spectrum with flat CN(0,1) statistics.
        cfg = datagen.DatagenConfig.make(frame_length=16)
        out = datagen.synthetic_batch(KEY, 2048, cfg)
        clean_c = np.asarray(iq_to_complex(out["clean"]))
        spec = np.fft.fft(clean_c, axis=-1) / np.sqrt(16)
        # spectrum bins should all carry equal average power (flat)
        p = np.mean(np.abs(spec) ** 2, axis=0)
        assert p.std() / p.mean() < 0.15

    def test_nonlinear_path_changes_noisy_only(self):
        cfg_lin = datagen.DatagenConfig.make(frame_length=16, snr_range=(100, 100))
        cfg_nl = datagen.DatagenConfig.make(
            frame_length=16, snr_range=(100, 100), nonlinear=True, pa_saturation=0.5
        )
        lin = datagen.synthetic_batch(KEY, 16, cfg_lin)
        nl = datagen.synthetic_batch(KEY, 16, cfg_nl)
        # same key -> same clean spectra pre-normalization; at 100 dB SNR the
        # linear noisy==clean but nonlinear noisy != clean.
        np.testing.assert_allclose(
            np.asarray(lin["noisy"]), np.asarray(lin["clean"]), atol=1e-4
        )
        assert np.abs(np.asarray(nl["noisy"]) - np.asarray(nl["clean"])).max() > 1e-3

    def test_fixed_snr_batch(self):
        cfg = datagen.DatagenConfig.make(frame_length=16)
        out = datagen.test_batch_at_snr(KEY, 8, 15.0, cfg)
        np.testing.assert_allclose(np.asarray(out["snr"]), 15.0)

    def test_reproducible_by_key(self):
        cfg = datagen.DatagenConfig.make(frame_length=16)
        a = datagen.synthetic_batch(jax.random.PRNGKey(7), 4, cfg)
        b = datagen.synthetic_batch(jax.random.PRNGKey(7), 4, cfg)
        np.testing.assert_array_equal(np.asarray(a["noisy"]), np.asarray(b["noisy"]))
