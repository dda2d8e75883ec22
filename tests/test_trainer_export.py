"""Trainer + export integration tests: epoch loop, checkpoint save/resume
round-trip, export file-format parity with the reference's layout."""

import json
from pathlib import Path

import numpy as np
import jax
import pytest

from ofdmgan_tpu.training.trainer import Trainer


def _mini_config(tmp_path, batch=16):
    return {
        "training": {
            "batch_size": batch,
            "epochs": 2,
            "optimizer": {"lr_generator": 1e-3, "lr_discriminator": 1e-3},
            "n_critic": 2,
            "checkpoint_interval": 1,
        },
        "channel": {"snr_range": [0, 30]},
        "paths": {
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_dir": str(tmp_path / "logs"),
            "export_dir": str(tmp_path / "export"),
        },
        "logging": {"tensorboard": False},
    }


class TestTrainer:
    def test_two_epoch_run_with_export(self, tmp_path):
        cfg = _mini_config(tmp_path)
        tr = Trainer(config=cfg, samples_per_epoch=64, val_samples=32, data_parallel=1)
        tr.train(epochs=2, experiment_name="t", export_after=True)
        # checkpoints written
        assert (tmp_path / "ckpt" / "final_model").exists()
        assert (tmp_path / "ckpt" / "checkpoint_epoch_1").exists()
        # export bundle written with reference layer names
        meta = json.loads((tmp_path / "export" / "generator" / "metadata.json").read_text())
        assert set(meta["layers"]) == {"enc1.conv", "bottleneck.conv", "dec1.conv", "out_conv"}
        for layer, info in meta["layers"].items():
            base = layer.replace(".", "_")
            assert (tmp_path / "export" / "generator" / f"{base}_weights.bin").exists()
            assert len(info["crc32"]) == 8
        # metrics JSONL written
        assert (tmp_path / "logs" / "t" / "metrics.jsonl").exists()

    def test_checkpoint_resume_roundtrip(self, tmp_path):
        cfg = _mini_config(tmp_path)
        tr = Trainer(config=cfg, samples_per_epoch=32, val_samples=16, data_parallel=1)
        tr.train_epoch(0)
        tr.current_epoch = 0
        tr.best_val_loss = 0.123
        tr.save_checkpoint(str(tmp_path / "ckpt" / "c1"))

        tr2 = Trainer(config=cfg, samples_per_epoch=32, val_samples=16, data_parallel=1)
        tr2.load_checkpoint(str(tmp_path / "ckpt" / "c1"))
        assert tr2.best_val_loss == 0.123
        a = jax.tree_util.tree_leaves(jax.device_get(tr.state.params_g))
        b = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params_g))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # optimizer state restored too
        sa = jax.tree_util.tree_leaves(jax.device_get(tr.state.opt_g))
        sb = jax.tree_util.tree_leaves(jax.device_get(tr2.state.opt_g))
        for x, y in zip(sa, sb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_dp_trainer(self, tmp_path):
        cfg = _mini_config(tmp_path)
        tr = Trainer(config=cfg, samples_per_epoch=32, val_samples=16, data_parallel=8)
        m = tr.train_epoch(0)
        assert np.isfinite(m["d_loss"])

    def test_init_from_warm_starts_params_with_fresh_optimizer(self, tmp_path):
        cfg = _mini_config(tmp_path)
        tr = Trainer(config=cfg, samples_per_epoch=32, val_samples=16, data_parallel=1)
        tr.train_epoch(0)
        tr.save_checkpoint(str(tmp_path / "ckpt" / "stage1"))
        trained = jax.device_get(tr.state.params_g)

        tr2 = Trainer(config=cfg, samples_per_epoch=32, val_samples=16,
                      data_parallel=1, ema_decay=0.9)
        tr2.init_params_from(str(tmp_path / "ckpt" / "stage1"))
        # params transferred ...
        for a, b in zip(jax.tree_util.tree_leaves(trained),
                        jax.tree_util.tree_leaves(jax.device_get(tr2.state.params_g))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # ... but optimizer state and step are FRESH (stage change)
        assert int(jax.device_get(tr2.state.step)) == 0
        mu = jax.tree_util.tree_leaves(jax.device_get(tr2.state.opt_g))
        assert all(np.all(np.asarray(x) == 0) for x in mu if hasattr(x, "shape") and np.asarray(x).ndim > 0)
        # EMA seeded from the warm-start params
        for a, b in zip(jax.tree_util.tree_leaves(trained),
                        jax.tree_util.tree_leaves(tr2.ema_params_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and training proceeds
        m = tr2.train_epoch(0)
        assert np.isfinite(m["d_loss"])

    def test_ema_tracks_saves_and_restores(self, tmp_path):
        cfg = _mini_config(tmp_path)
        tr = Trainer(config=cfg, samples_per_epoch=32, val_samples=16,
                     data_parallel=1, ema_decay=0.9)
        init = jax.device_get(tr.ema_params_g)
        tr.train_epoch(0)
        # EMA moved but is NOT equal to the raw params (it lags the trajectory)
        ema = jax.device_get(tr.ema_params_g)
        raw = jax.device_get(tr.state.params_g)
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(init), jax.tree_util.tree_leaves(ema))
        )
        lags = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(raw))
        )
        assert moved and lags
        # validation reports both raw and EMA metrics, all finite
        vm = tr.validate()
        assert {"rec_loss", "mse", "rec_loss_ema", "mse_ema"} <= set(vm)
        assert all(np.isfinite(v) for v in vm.values())
        # checkpoint round-trips the EMA tree
        tr.save_checkpoint(str(tmp_path / "ckpt" / "e1"))
        tr2 = Trainer(config=cfg, samples_per_epoch=32, val_samples=16,
                      data_parallel=1, ema_decay=0.9)
        tr2.load_checkpoint(str(tmp_path / "ckpt" / "e1"))
        for a, b in zip(jax.tree_util.tree_leaves(ema),
                        jax.tree_util.tree_leaves(jax.device_get(tr2.ema_params_g))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExportFormat:
    def test_export_matches_reference_byte_layout(self, tmp_path):
        """Weights bin: int8, torch [out,in,k] flattening; scale float32
        per-out-channel; metadata keys exactly as quantization.py:366-378."""
        from ofdmgan_tpu.models import MiniGenerator
        from ofdmgan_tpu.quant.export import export_generator, generator_layers

        key = jax.random.PRNGKey(0)
        model = MiniGenerator()
        params = model.init(key, np.zeros((1, 16, 2), np.float32))
        meta = export_generator(params, str(tmp_path))

        layers = generator_layers(params)
        enc1 = layers[0]
        assert enc1.weight.shape == (4, 2, 3)  # torch layout

        # reproduce quantization with the reference formulas (numpy oracle)
        w = enc1.weight
        absmax = np.maximum(np.abs(w).max(axis=(1, 2), keepdims=True), 1e-8)
        scale = absmax / 127.0
        q = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
        got = np.fromfile(tmp_path / "enc1_conv_weights.bin", dtype=np.int8)
        np.testing.assert_array_equal(got, q.flatten())
        s = np.fromfile(tmp_path / "enc1_conv_scale.bin", dtype=np.float32)
        np.testing.assert_allclose(s, scale.squeeze(), rtol=1e-6)
        b = np.fromfile(tmp_path / "enc1_conv_bias.bin", dtype=np.float32)
        assert b.shape == (4,)

        info = meta["layers"]["enc1.conv"]
        assert list(info.keys()) == ["type", "weight_file", "scale_file", "bias",
                                     "weight_shape", "kernel_size", "stride", "padding",
                                     "in_channels", "out_channels", "crc32"]
        assert info["stride"] == 2 and info["in_channels"] == 2 and info["out_channels"] == 4

        import binascii
        assert info["crc32"] == f"{binascii.crc32(q.flatten().tobytes()) & 0xFFFFFFFF:08x}"

    def test_discriminator_export(self, tmp_path):
        from ofdmgan_tpu.models import MiniDiscriminator
        from ofdmgan_tpu.quant.export import export_discriminator

        key = jax.random.PRNGKey(0)
        model = MiniDiscriminator()
        x = np.zeros((1, 16, 2), np.float32)
        params = model.init(key, x, x)
        meta = export_discriminator(params, str(tmp_path))
        assert set(meta["layers"]) == {"conv1", "conv2", "dense"}
        dense = meta["layers"]["dense"]
        assert dense["in_features"] == 16 and dense["out_features"] == 1
        w = np.fromfile(tmp_path / "dense_weights.bin", dtype=np.int8)
        assert w.shape == (16,)

    def test_int32_bias_format(self, tmp_path):
        from ofdmgan_tpu.models import MiniGenerator
        from ofdmgan_tpu.quant.export import export_generator

        key = jax.random.PRNGKey(0)
        params = MiniGenerator().init(key, np.zeros((1, 16, 2), np.float32))
        export_generator(params, str(tmp_path), write_bias_format="int32_q1616")
        b = np.fromfile(tmp_path / "enc1_conv_bias.bin", dtype=np.int32)
        assert b.shape == (4,)
        np.testing.assert_array_equal(b, 0)  # zero-init biases
