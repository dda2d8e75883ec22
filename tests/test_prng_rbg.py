"""Regression coverage for the shipping PRNG default (``--prng rbg``).

The bench/train default since round 4 is the *safe* rbg implementation:
threefry key derivation (split/fold_in) with bulk bit generation on the
hardware RngBitGenerator (trainer.py plumbs it via typed keys,
``jax.random.key(seed, impl="rbg")``). Until round 5 its only correctness
evidence was the offline 500-epoch twin study
(results/stability_twins_r4/premap_saferbg*) — nothing guarded against a
jax upgrade changing ``impl="rbg"`` semantics, or against per-device
``fold_in`` composition silently correlating shards (the exact failure
mode that disqualified ``unsafe_rbg``: its cheap fold_in correlated
adjacent-step datagen draws, pooled p≈0.02 over 3 seed twins).

These tests pin the *distributional* contract on the CPU backend (the
generator family differs from the TPU's, but the contract — unit normals,
uniform SNR, cross-shard/cross-step independence — is implementation-
independent). The statistic used is the one that convicted unsafe_rbg:
correlation between draws of adjacent fold_in-derived streams.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from ofdmgan_tpu.signal import DatagenConfig
from ofdmgan_tpu.signal.datagen import synthetic_batch_flat

REPO = Path(__file__).resolve().parents[1]


def _key(impl, seed=0):
    if impl == "threefry":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


CFG = DatagenConfig.make(frame_length=16, snr_range=(0, 30))


class TestRbgDatagenDistribution:
    """The rbg datagen stream must match threefry's *distribution* (not its
    values — different streams by construction)."""

    @pytest.mark.parametrize("field", ["noisy", "clean"])
    def test_ks_parity_vs_threefry(self, field):
        b_tf = jax.jit(lambda k: synthetic_batch_flat(k, 4096, CFG))(
            _key("threefry"))
        b_rbg = jax.jit(lambda k: synthetic_batch_flat(k, 4096, CFG))(
            _key("rbg"))
        a = np.asarray(b_tf[field]).ravel()
        b = np.asarray(b_rbg[field]).ravel()
        # subsample for an honest KS p-value (full 131k would flag even
        # trivially small model-irrelevant deviations)
        rng = np.random.default_rng(0)
        a = rng.choice(a, 8192, replace=False)
        b = rng.choice(b, 8192, replace=False)
        st, p = stats.ks_2samp(a, b)
        assert p > 1e-3, (field, st, p)

    def test_moments_and_snr_uniformity(self):
        b = jax.jit(lambda k: synthetic_batch_flat(k, 8192, CFG))(_key("rbg"))
        snr = np.asarray(b["snr"])
        assert 0.0 <= snr.min() and snr.max() <= 30.0
        # uniform(0,30): mean 15 ± 4.5*std/sqrt(n)
        assert abs(snr.mean() - 15.0) < 4.5 * (30 / np.sqrt(12)) / np.sqrt(snr.size)
        # joint max-abs normalization bounds both signals in [-1, 1]
        assert np.max(np.abs(np.asarray(b["noisy"]))) <= 1.0 + 1e-6
        assert np.max(np.abs(np.asarray(b["clean"]))) <= 1.0 + 1e-6
        # clean is max-normalized filtered gaussian; sanity-bound its spread
        assert 0.1 < np.asarray(b["clean"]).std() < 0.5


class TestRbgFoldInIndependence:
    """Per-device and per-step streams come from fold_in (parallel/mesh.py:59,
    wgan_gp per-step keys). unsafe_rbg was rejected because this derivation
    correlated adjacent streams — pin the safe impl's independence."""

    N = 1 << 14
    # |corr| of two independent n-sample streams is ~N(0, 1/sqrt(n));
    # 5 sigma over the max of ~30 pairs tested
    BOUND = 5.0 / np.sqrt(N)

    def _streams(self, impl, n_streams):
        k = _key(impl)
        draw = jax.jit(lambda kk: jax.random.normal(kk, (self.N,)))
        return [np.asarray(draw(jax.random.fold_in(k, i)))
                for i in range(n_streams)]

    @pytest.mark.parametrize("impl", ["rbg", "threefry"])
    def test_cross_shard_independence(self, impl):
        # device-index fold_in composition: all pairs, like an 8-device mesh
        s = self._streams(impl, 8)
        worst = max(abs(float(np.corrcoef(s[i], s[j])[0, 1]))
                    for i in range(8) for j in range(i + 1, 8))
        assert worst < self.BOUND, (impl, worst, self.BOUND)

    @pytest.mark.parametrize("impl", ["rbg", "threefry"])
    def test_adjacent_step_datagen_independence(self, impl):
        # the conviction statistic: correlation between the *datagen outputs*
        # of adjacent per-step keys (what unsafe_rbg failed at recipe scale)
        k = _key(impl)
        gen = jax.jit(lambda kk: synthetic_batch_flat(kk, 512, CFG)["noisy"])
        outs = [np.asarray(gen(jax.random.fold_in(k, s))).ravel()
                for s in range(6)]
        n = outs[0].size
        worst = max(abs(float(np.corrcoef(outs[s], outs[s + 1])[0, 1]))
                    for s in range(5))
        assert worst < 5.0 / np.sqrt(n), (impl, worst)

    def test_shard_by_step_grid_independence(self):
        # the composed derivation used in the sharded step: fold_in(device)
        # then fold_in(step). Check the full 4x4 grid pairwise.
        k = _key("rbg")
        draw = jax.jit(lambda kk: jax.random.normal(kk, (self.N,)))
        grid = [np.asarray(draw(jax.random.fold_in(jax.random.fold_in(k, d), s)))
                for d in range(4) for s in range(4)]
        worst = 0.0
        for i in range(len(grid)):
            for j in range(i + 1, len(grid)):
                worst = max(worst, abs(float(np.corrcoef(grid[i], grid[j])[0, 1])))
        assert worst < 5.5 / np.sqrt(self.N), worst


class TestRbgCLI:
    def test_train_prng_rbg_smoke(self, tmp_path):
        """train.py --prng rbg end-to-end (the shipped default path had no
        CLI coverage before round 5)."""
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [sys.executable, str(REPO / "train.py"), "--config",
             str(REPO / "config/config.yaml"), "--synthetic", "--platform",
             "cpu", "--epochs", "1", "--batch_size", "16",
             "--samples_per_epoch", "48", "--prng", "rbg", "--skip_export",
             "--experiment", "rbgcli"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Epoch 0:" in r.stdout
