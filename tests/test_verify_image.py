"""Tests for arch verification, reconstruction proof, and the image<->OFDM
path (round-trip pixel fidelity, image dataset sampling)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.models import MiniGenerator, MiniDiscriminator
from ofdmgan_tpu.verify.arch_check import MiniArchitectureVerifier, run_full_verification
from ofdmgan_tpu.verify import proof
from ofdmgan_tpu.signal import image_ofdm

KEY = jax.random.PRNGKey(0)


class TestArchCheck:
    def test_full_verification_passes(self, tmp_path):
        res = run_full_verification(output_dir=str(tmp_path))
        assert all(r.passed for r in res.values()), {
            k: r.details for k, r in res.items() if not r.passed
        }
        summary = json.loads((tmp_path / "verification_summary.json").read_text())
        assert summary["generator"]["passed"]
        assert (tmp_path / "golden_vectors" / "input.hex").exists()

    def test_wrong_architecture_fails(self):
        # runnable but wrong progression (2->6->8->6->2 instead of 2->4->8->4->2)
        model = MiniGenerator(enc1_channels=6, dec1_channels=6)
        params = model.init(KEY, jnp.zeros((1, 16, 2)))
        v = MiniArchitectureVerifier()
        res = v.verify_generator(model, params)
        assert not res.passed
        assert not res.details["channel_test"]["passed"]


class TestProof:
    def test_signal_enhancement_metrics(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        r = proof.test_signal_enhancement(gen.apply, params, snr_db=10.0, n_samples=50)
        assert r["mse_before"] > 0 and r["mse_after"] > 0
        assert np.isfinite(r["snr_improvement_db"])

    def test_int_datapath_proof(self):
        gen = MiniGenerator()
        params = gen.init(KEY, jnp.zeros((1, 16, 2)))
        r = proof.test_int_datapath_enhancement(params, snr_db=10.0, n_samples=20)
        assert r["mode"] == "rtl" and np.isfinite(r["snr_improvement_db"])


class TestImageOFDM:
    def _image(self):
        rng = np.random.default_rng(0)
        return (rng.integers(0, 256, (16, 16))).astype(np.uint8)

    def test_roundtrip_lossless_when_unclipped(self):
        # frame long enough to carry all bits -> perfect pixel recovery
        img = self._image()
        cfg = image_ofdm.ImageOFDMConfig("QAM16", 64, 16, frame_length=1024)
        iq, meta = image_ofdm.image_to_ofdm(img, cfg)
        assert iq.shape == (1024, 2)
        assert meta["n_bits"] == 16 * 16 * 8
        back = image_ofdm.ofdm_to_image(iq, img.shape, cfg, meta["normalization_factor"])
        np.testing.assert_array_equal(back, img)

    def test_truncation_path(self):
        img = self._image()
        cfg = image_ofdm.ImageOFDMConfig("QPSK", 8, 2, frame_length=16)
        iq, meta = image_ofdm.image_to_ofdm(img, cfg)
        assert iq.shape == (16, 2)
        assert float(np.abs(iq).max()) <= 1.0 + 1e-6

    def test_chunk_dataset_matches_simulator_protocol(self, tmp_path):
        """ImageOFDMChunkDataset: full (untruncated, padded) signals split
        into aligned 16-chunks; AWGN at the per-image padded-signal power;
        noisy-max normalization (the simulator's _enhance protocol)."""
        import jax

        from PIL import Image

        rng = np.random.default_rng(3)
        for i in range(2):
            Image.fromarray(rng.integers(0, 256, (16, 16)).astype(np.uint8),
                            "L").save(tmp_path / f"im{i}.png")
        ds = image_ofdm.ImageOFDMChunkDataset(str(tmp_path), pad_to=1024)
        # 16x16 image -> 2048 bits -> 512 QAM16 symbols -> 8 OFDM symbols
        # x 80 samples = 640 -> padded to 1024 -> 64 chunks per image
        assert ds._chunks.shape == (128, 16, 2)
        b = ds.sample_batch(jax.random.PRNGKey(0), 64)
        assert b["noisy"].shape == (64, 16, 2)
        m = np.abs(np.asarray(b["noisy"])).reshape(64, -1).max(1)
        np.testing.assert_allclose(m, 1.0, atol=1e-5)  # noisy-max normalized
        assert np.isfinite(np.asarray(b["clean"])).all()

    def test_image_to_ofdm_no_truncate(self):
        img = self._image()
        cfg = image_ofdm.ImageOFDMConfig("QAM16", 64, 16, frame_length=16)
        iq_full, meta = image_ofdm.image_to_ofdm(img, cfg, normalize=False,
                                                 truncate=False)
        assert iq_full.shape[0] == meta["signal_length"] >= 640
        iq_trunc, _ = image_ofdm.image_to_ofdm(img, cfg, normalize=False)
        np.testing.assert_array_equal(iq_trunc, iq_full[:16])

    def test_rgb_to_gray(self):
        rgb = np.zeros((4, 4, 3), np.uint8)
        rgb[..., 0] = 255
        g = image_ofdm.to_grayscale(rgb)
        assert g.shape == (4, 4) and int(g[0, 0]) == 76  # 0.299*255

    def test_image_dataset(self, tmp_path):
        from PIL import Image

        for i in range(3):
            Image.fromarray(self._image()).save(tmp_path / f"img{i}.png")
        ds = image_ofdm.ImageOFDMDataset(
            str(tmp_path), frame_length=16, modulation="QPSK",
            n_subcarriers=8, cp_length=2, samples_per_image=10,
        )
        assert len(ds) == 30
        batch = ds.sample_batch(KEY, 8)
        assert batch["noisy"].shape == (8, 16, 2)
        m = np.maximum(
            np.abs(np.asarray(batch["noisy"])).reshape(8, -1).max(1),
            np.abs(np.asarray(batch["clean"])).reshape(8, -1).max(1),
        )
        np.testing.assert_allclose(m, 1.0, atol=1e-5)
