"""Distributional metrics (eval/distributional.py): sanity on known cases.

The metric suite must (a) score a perfect generator at the null floor,
(b) separate obviously-wrong distributions, (c) agree with closed-form
expectations on simple inputs. (No reference counterpart — its evaluation
is purely paired, benchmark_comparison.py:137-146.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofdmgan_tpu.eval.distributional import (
    amplitude_moments, make_report_fn, median_bandwidth, mmd2_unbiased,
    periodogram_db, psd_distance_db,
)
from ofdmgan_tpu.signal.datagen import DatagenConfig


def test_psd_distance_zero_on_identical():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 16, 2))
    assert float(psd_distance_db(x, x)) == 0.0


def test_psd_distance_detects_lowpass():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 16, 2))
    # crude low-pass: zero the upper half of the spectrum
    c = x[..., 0] + 1j * x[..., 1]
    spec = jnp.fft.fft(c, axis=-1).at[:, 4:13].set(0.0)
    y = jnp.fft.ifft(spec, axis=-1)
    y = jnp.stack([y.real, y.imag], -1)
    assert float(psd_distance_db(y, x)) > 3.0


def test_amplitude_moments_rayleigh():
    # |CN(0, 2σ²)| is Rayleigh(σ): mean σ√(π/2), std σ√(2-π/2)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4096, 16, 2))
    m = np.asarray(amplitude_moments(x))
    sigma = 1.0
    np.testing.assert_allclose(m[0], sigma * np.sqrt(np.pi / 2), rtol=0.02)
    np.testing.assert_allclose(m[1], sigma * np.sqrt(2 - np.pi / 2), rtol=0.03)


def test_mmd2_same_distribution_near_zero_different_large():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (512, 32))
    y = jax.random.normal(k2, (512, 32))
    z = 0.3 * jax.random.normal(k3, (512, 32))  # under-dispersed
    bw = median_bandwidth(x)
    same = float(mmd2_unbiased(x, y, bw))
    diff = float(mmd2_unbiased(x, z, bw))
    assert abs(same) < 5e-3
    assert diff > 10 * max(abs(same), 1e-6)


def test_report_fn_perfect_generator_hits_null_floor():
    """A generator that outputs the paired clean frame exactly must score
    MMD² at the clean-vs-clean null scale and PSD distance ~0."""
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))

    # cheat-free perfect generator is impossible; emulate by enhancing with
    # an oracle that returns fresh clean frames from a different seed: the
    # *distribution* matches even though pairing is broken
    from ofdmgan_tpu.signal.datagen import synthetic_batch

    def oracle_apply(params, noisy):
        # derive a per-batch key from the data so every scan iteration
        # draws FRESH clean frames (a constant key would duplicate samples
        # across batches and bias the MMD estimator)
        salt = jnp.int32(jnp.round(jnp.sum(noisy * 1e3))) % 100000
        k = jax.random.fold_in(jax.random.PRNGKey(99), salt)
        return synthetic_batch(k, noisy.shape[0], dg)["clean"]

    report = make_report_fn(oracle_apply, dg, batch_size=128, n_batches=8,
                            mmd_samples=512)
    r = jax.device_get(report({}, jax.random.PRNGKey(0)))
    assert float(r["psd_distance_db"]) < 0.5
    # MMD² within a few null floors (both are ~0 up to estimator noise)
    assert abs(float(r["mmd2"])) < 20 * max(abs(float(r["mmd2_null"])), 1e-5)


def test_report_fn_noisy_worse_than_clean():
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 10))
    report = make_report_fn(lambda p, x: x, dg, batch_size=128, n_batches=8,
                            mmd_samples=512)
    r = jax.device_get(report({}, jax.random.PRNGKey(0)))
    # raw noisy frames are measurably off the clean distribution
    assert float(r["mmd2"]) > 5 * max(abs(float(r["mmd2_null"])), 1e-6)
    assert float(r["paired_l1"]) > 0.05
