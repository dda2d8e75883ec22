"""Pallas datagen kernel tests.

The CPU test rig can only exercise kernel *plumbing* via the Pallas TPU
interpreter (whose hardware-PRNG stub returns zero bits, so all randomness
degenerates) plus exact numpy checks of the structured basis matrices
(IDFT, segment-mean, block-triangular prefix sum). Statistical equivalence
with the XLA path needs real-TPU PRNG: it runs in ``python -m
ofdmgan_tpu.selfcheck`` on the TPU (and here when OFDMGAN_TEST_PLATFORM
selects a TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from ofdmgan_tpu.ops.pallas_datagen import _basis_matrices, synthetic_batch_pallas

ON_TPU = jax.devices()[0].platform != "cpu"


class TestPlumbing:
    def test_interpreter_contract(self):
        with pltpu.force_tpu_interpret_mode():
            out = synthetic_batch_pallas(jax.random.PRNGKey(0), 1024, tile_rows=64)
        assert out["noisy"].shape == (1024, 16, 2)
        assert out["clean"].shape == (1024, 16, 2)
        assert out["snr"].shape == (1024,)
        assert np.isfinite(np.asarray(out["noisy"])).all()

    def test_interpreter_contract_nonlinear(self):
        with pltpu.force_tpu_interpret_mode():
            out = synthetic_batch_pallas(jax.random.PRNGKey(0), 256, tile_rows=32,
                                         nonlinear=True, pa_saturation=0.8)
        assert out["noisy"].shape == (256, 16, 2)
        assert np.isfinite(np.asarray(out["noisy"])).all()

    def test_interpreter_contract_parametric_length(self):
        for L, B in ((64, 128), (128, 64), (256, 32)):
            with pltpu.force_tpu_interpret_mode():
                out = synthetic_batch_pallas(jax.random.PRNGKey(0), B, tile_rows=16,
                                             frame_length=L, nonlinear=True)
            assert out["noisy"].shape == (B, L, 2)
            assert np.isfinite(np.asarray(out["noisy"])).all()

    def test_batch_divisibility_assert(self):
        with pytest.raises(AssertionError):
            synthetic_batch_pallas(jax.random.PRNGKey(0), 12)

    def test_unsupported_lengths_raise(self):
        with pytest.raises(ValueError):
            synthetic_batch_pallas(jax.random.PRNGKey(0), 24, frame_length=12)
        with pytest.raises(ValueError):
            synthetic_batch_pallas(jax.random.PRNGKey(0), 192, frame_length=192)

    @pytest.mark.parametrize("L", [16, 64, 128])
    def test_basis_matrices_are_exact(self, L):
        bdr, bdi, seg, tri = _basis_matrices(L)
        W = max(L, 128)
        pack = W // L
        rng = np.random.default_rng(0)
        s = rng.standard_normal(W) + 1j * rng.standard_normal(W)
        got = (s.real @ bdr - s.imag @ bdi) + 1j * (s.real @ bdi + s.imag @ bdr)
        for f in range(pack):
            blk = s[f * L:(f + 1) * L]
            expected = np.fft.ifft(blk) * np.sqrt(L)
            np.testing.assert_allclose(got[f * L:(f + 1) * L], expected, atol=1e-5)
        # segment matrix: frame-mean at every sample
        x = rng.standard_normal(W).astype(np.float32)
        m = x @ seg
        for f in range(pack):
            np.testing.assert_allclose(
                m[f * L:(f + 1) * L], x[f * L:(f + 1) * L].mean(), atol=1e-5,
            )
        # triangular matrix: within-frame inclusive prefix sum (the phase-
        # noise cumsum as one MXU matmul)
        c = x @ tri
        for f in range(pack):
            np.testing.assert_allclose(
                c[f * L:(f + 1) * L], np.cumsum(x[f * L:(f + 1) * L]),
                atol=1e-4,
            )


@pytest.mark.skipif(
    not ON_TPU,
    reason="statistical tests need real TPU PRNG — the recorded evidence is "
           "the committed per-round selfcheck artifact "
           "(results/selfcheck_r03.json, 'pallas-datagen' entry with the "
           "measured statistics; regenerate with "
           "`python -m ofdmgan_tpu.selfcheck --json ...` on the TPU)")
class TestStatisticsOnTPU:
    def test_matches_xla_statistics(self):
        from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch

        out = jax.jit(lambda k: synthetic_batch_pallas(k, 65536))(jax.random.PRNGKey(0))
        cfg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
        ref = jax.jit(lambda k: synthetic_batch(k, 65536, cfg))(jax.random.PRNGKey(1))
        for k in ("noisy", "clean"):
            assert abs(float(out[k].std()) - float(ref[k].std())) < 0.01
        s = np.asarray(out["snr"])
        assert s.min() >= 0 and s.max() <= 30 and abs(s.mean() - 15) < 0.5

    def test_matches_xla_statistics_nonlinear(self):
        from ofdmgan_tpu.signal import DatagenConfig, synthetic_batch

        kw = dict(nonlinear=True, pa_saturation=0.8)
        out = jax.jit(lambda k: synthetic_batch_pallas(
            k, 65536, frame_length=16, **kw))(jax.random.PRNGKey(0))
        cfg = DatagenConfig.make(frame_length=16, snr_range=(0, 30), **kw)
        ref = jax.jit(lambda k: synthetic_batch(k, 65536, cfg))(jax.random.PRNGKey(1))
        for k in ("noisy", "clean"):
            assert abs(float(out[k].std()) - float(ref[k].std())) < 0.01
        # PA compression + phase noise change the noisy/clean relationship;
        # compare the distribution of per-frame L1(noisy, clean) too
        d_out = float(jnp.mean(jnp.abs(out["noisy"] - out["clean"])))
        d_ref = float(jnp.mean(jnp.abs(ref["noisy"] - ref["clean"])))
        assert abs(d_out - d_ref) < 0.01, (d_out, d_ref)
