"""Equalizer tests: numpy-oracle parity for each algorithm (the oracle
re-implements the reference's published recurrences in straight numpy) plus
behavior checks on multipath channels (mirrors classical_equalizers.py:640-678
self-verification)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.eval import equalizers as eq
from ofdmgan_tpu.utils.iq import complex_to_iq

rng = np.random.default_rng(42)


def _test_signals(n=64, snr_db=15):
    clean = (rng.choice([-1, 1], n) + 1j * rng.choice([-1, 1], n)) / np.sqrt(2)
    h = np.array([1.0, 0.3 + 0.2j, 0.1 - 0.1j])
    sig_p = np.mean(np.abs(clean) ** 2)
    noise = np.sqrt(sig_p / 10 ** (snr_db / 10) / 2) * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    noisy = np.convolve(clean, h, mode="same") + noise
    return clean.astype(np.complex64), noisy.astype(np.complex64)


# ------------------------------ numpy oracles (from the published formulas)
def oracle_dfe(received, training, n_ff=5, n_fb=3, mu=0.01):
    w_ff = np.zeros(n_ff, complex); w_ff[n_ff // 2] = 1.0
    w_fb = np.zeros(n_fb, complex)
    fb = np.zeros(n_fb, complex)
    rp = np.concatenate([np.zeros(n_ff // 2), received, np.zeros(n_ff // 2)])
    for n in range(len(training)):
        ff = rp[n : n + n_ff]
        y = np.dot(w_ff, ff) - np.dot(w_fb, fb)
        e = training[n] - y
        w_ff = w_ff + mu * e * np.conj(ff)
        w_fb = w_fb - mu * e * np.conj(fb)
        fb = np.concatenate([[training[n]], fb[:-1]])
    # decision-directed pass
    fb = np.zeros(n_fb, complex)
    out = np.zeros(len(received), complex)
    for n in range(len(received)):
        ff = rp[n : n + n_ff]
        y = np.dot(w_ff, ff) - np.dot(w_fb, fb)
        out[n] = y
        dec = (np.sign(y.real) + 1j * np.sign(y.imag)) / np.sqrt(2)
        fb = np.concatenate([[dec], fb[:-1]])
    return out


def oracle_lms(received, desired, n_taps=11, mu=0.01):
    t2 = n_taps // 2
    w = np.zeros(n_taps, complex); w[t2] = 1.0
    for n in range(t2, len(received) - t2):
        x = received[n - t2 : n + t2 + 1]
        e = desired[n] - np.dot(w, x)
        w = w + mu * e * np.conj(x)
    out = np.zeros(len(received), complex)
    for n in range(t2, len(received) - t2):
        out[n] = np.dot(w, received[n - t2 : n + t2 + 1])
    return out


def oracle_rls(received, desired, n_taps=11, lam=0.99, delta=0.1):
    t2 = n_taps // 2
    w = np.zeros(n_taps, complex); w[t2] = 1.0
    p = np.eye(n_taps, dtype=complex) / delta
    for n in range(t2, len(received) - t2):
        x = received[n - t2 : n + t2 + 1].reshape(-1, 1)
        px = p @ x
        k = px / (lam + (x.conj().T @ px)[0, 0])
        e = desired[n] - (w.reshape(-1, 1).conj().T @ x)[0, 0]
        w = w + (k * np.conj(e)).flatten()
        p = (p - k @ x.conj().T @ p) / lam
    out = np.zeros(len(received), complex)
    for n in range(t2, len(received) - t2):
        out[n] = np.dot(np.conj(w), received[n - t2 : n + t2 + 1])
    return out


class TestOracleParity:
    def test_zf_is_near_perfect_with_oracle_channel(self):
        clean, noisy = _test_signals()
        out = np.asarray(eq.zf_equalize(jnp.asarray(noisy), jnp.asarray(clean)))
        # per-sample oracle H makes ZF reconstruct clean almost exactly
        assert np.mean(np.abs(out - clean) ** 2) < 1e-6

    def test_mmse_formula(self):
        clean, noisy = _test_signals()
        out = np.asarray(eq.mmse_equalize(jnp.asarray(noisy), jnp.asarray(clean), 15.0))
        h = noisy / (clean + 1e-10)
        expected = np.conj(h) / (np.abs(h) ** 2 + 10 ** (-1.5)) * noisy
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=1e-5)

    def test_dfe_matches_oracle(self):
        clean, noisy = _test_signals()
        got = np.asarray(eq.dfe_equalize(
            jnp.asarray(noisy), *eq.dfe_train(jnp.asarray(noisy), jnp.asarray(clean))
        ))
        expected = oracle_dfe(noisy.astype(complex), clean.astype(complex))
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_lms_matches_oracle(self):
        clean, noisy = _test_signals()
        w, _ = eq.lms_train(jnp.asarray(noisy), jnp.asarray(clean))
        got = np.asarray(eq.lms_equalize(jnp.asarray(noisy), w))
        expected = oracle_lms(noisy.astype(complex), clean.astype(complex))
        np.testing.assert_allclose(got, expected, atol=2e-4)
        # edges are zero
        assert np.all(got[:5] == 0) and np.all(got[-5:] == 0)

    def test_rls_matches_oracle(self):
        clean, noisy = _test_signals()
        w, _ = eq.rls_train(jnp.asarray(noisy), jnp.asarray(clean))
        got = np.asarray(eq.rls_equalize(jnp.asarray(noisy), w))
        expected = oracle_rls(noisy.astype(complex), clean.astype(complex))
        np.testing.assert_allclose(got, expected, atol=3e-3)


class TestBehavior:
    def test_all_beat_or_match_noeq_on_multipath(self):
        clean, noisy = _test_signals(n=64, snr_db=20)
        clean_iq = jnp.asarray(complex_to_iq(jnp.asarray(clean)))
        noisy_iq = jnp.asarray(complex_to_iq(jnp.asarray(noisy)))
        res = eq.compare_equalizers(noisy_iq, clean_iq, snr_db=20.0)
        noeq_mse = float(jnp.mean((noisy_iq - clean_iq) ** 2))
        # ZF/MMSE (oracle channel) must beat NoEQ; adaptive ones at least run
        assert res["ZF"]["mse"] < noeq_mse
        assert res["MMSE"]["mse"] < noeq_mse
        for name in ("DFE", "LMS", "RLS"):
            assert np.isfinite(res[name]["mse"])

    def test_vmapped_over_trials(self):
        clean, noisy = _test_signals()
        c = jnp.tile(jnp.asarray(complex_to_iq(jnp.asarray(clean)))[None], (8, 1, 1))
        n = jnp.tile(jnp.asarray(complex_to_iq(jnp.asarray(noisy)))[None], (8, 1, 1))
        out, m = jax.vmap(eq.dfe_equalize_iq)(n, c)
        assert out.shape == (8, 64, 2)
        assert np.allclose(np.asarray(m["mse"]), float(m["mse"][0]))

    def test_16_sample_frames_lms_edge_zeroing(self):
        # On L=16 frames LMS/RLS only fill samples 5..10 (reference quirk).
        clean, noisy = _test_signals(n=16)
        w, _ = eq.lms_train(jnp.asarray(noisy), jnp.asarray(clean))
        out = np.asarray(eq.lms_equalize(jnp.asarray(noisy), w))
        assert np.all(out[:5] == 0) and np.all(out[11:] == 0)
        assert np.any(out[5:11] != 0)
