"""CLI surface smoke tests: every entry point runs end-to-end on the CPU
platform via subprocess (flag parsing, wiring, artifact emission). Slow-ish
(~3 min) but guards the user-facing contract."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run(args, cwd, timeout=420):
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


class TestCLIs:
    def test_train_and_resume_and_export(self, workdir):
        r = run([str(REPO / "train.py"), "--config", str(REPO / "config/config.yaml"),
                 "--synthetic", "--platform", "cpu", "--epochs", "2",
                 "--batch_size", "16", "--samples_per_epoch", "64",
                 "--experiment", "cli"], cwd=workdir)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Epoch 1:" in r.stdout
        assert (workdir / "checkpoints" / "final_model").exists()
        assert (workdir / "export" / "generator" / "metadata.json").exists()

        # resume
        r2 = run([str(REPO / "train.py"), "--config", str(REPO / "config/config.yaml"),
                  "--synthetic", "--platform", "cpu", "--epochs", "3",
                  "--batch_size", "16", "--samples_per_epoch", "64",
                  "--resume", str(workdir / "checkpoints" / "final_model"),
                  "--skip_export", "--experiment", "cli2"], cwd=workdir)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "Resuming" in r2.stdout and "Epoch 2:" in r2.stdout

        # standalone export CLI
        r3 = run([str(REPO / "export.py"), "--checkpoint",
                  str(workdir / "checkpoints" / "final_model"),
                  "--export_dir", str(workdir / "exp2"), "--discriminator"],
                 cwd=workdir)
        assert r3.returncode == 0, r3.stderr[-2000:]
        assert (workdir / "exp2" / "discriminator" / "dense_weights.bin").exists()

    def test_train_fading_channel_residual(self, workdir):
        """--channel + --residual (the fading-trained model recipe,
        results/fading/): datagen wires the channel config through the
        fused step and the residual head trains without NaNs."""
        r = run([str(REPO / "train.py"), "--config", str(REPO / "config/config.yaml"),
                 "--synthetic", "--platform", "cpu", "--epochs", "2",
                 "--batch_size", "16", "--samples_per_epoch", "64",
                 "--channel", "multipath", "--nonlinear", "--residual",
                 "--skip_export", "--checkpoint_dir",
                 str(workdir / "ckpt_fading"), "--experiment", "cli_fading"],
                cwd=workdir)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Epoch 1:" in r.stdout
        assert (workdir / "ckpt_fading" / "final_model").exists()

    def test_benchmark_cli(self, workdir):
        r = run([str(REPO / "benchmark_comparison.py"), "--platform", "cpu",
                 "--checkpoint", str(workdir / "checkpoints" / "final_model"),
                 "--n_trials", "4", "--snr_min", "0", "--snr_max", "30",
                 "--snr_step", "30", "--output_dir", str(workdir / "bench")],
                cwd=workdir)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Linear AWGN Channel" in r.stdout
        assert (workdir / "bench" / "benchmark_nonlinear.png").exists()

    def test_export_mini_weights_cli(self, workdir):
        r = run([str(REPO / "export_mini_weights.py"),
                 "--export_dir", str(workdir / "export" / "generator"),
                 "--output", str(workdir / "rom" / "weight_rom.v")], cwd=workdir)
        assert r.returncode == 0, r.stderr[-2000:]
        text = (workdir / "rom" / "weight_rom.v").read_text()
        assert "module weight_rom" in text and "module bias_rom" in text

    def test_test_models_script(self, workdir):
        r = run([str(REPO / "test_models.py")], cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr[-500:]
        assert "6/6 tests passed" in r.stdout

    def test_eval_checkpoint_and_extract_champion(self, workdir, tmp_path):
        """scripts/eval_checkpoint.py (paired identity + checkpoint rows) and
        scripts/extract_champion.py (npz round-trip into the evaluator)."""
        ckpt = workdir / "checkpoints" / "final_model"
        r = run([str(REPO / "scripts" / "extract_champion.py"),
                 "--checkpoint", str(ckpt), "--out", str(tmp_path / "champ")],
                cwd=workdir)
        assert r.returncode == 0, r.stderr[-1500:]
        npz = tmp_path / "champ" / "champion_params_g.npz"
        assert npz.exists()
        r2 = run([str(REPO / "scripts" / "eval_checkpoint.py"), "--platform", "cpu",
                  "--identity", "--checkpoint", str(ckpt), str(npz),
                  "--batches", "2", "--batch_size", "32"], cwd=workdir)
        assert r2.returncode == 0, r2.stderr[-1500:]
        assert "identity:" in r2.stdout
        # Orbax dir and its npz extraction evaluate to the SAME paired number
        import re

        l1s = re.findall(r"val L1 ([0-9.]+)", r2.stdout)
        assert len(l1s) == 3 and l1s[1] == l1s[2], r2.stdout

    def test_selfcheck(self, workdir):
        r = run(["-c", "import jax; jax.config.update('jax_platforms','cpu');"
                 "import sys; from ofdmgan_tpu.selfcheck import main; sys.exit(main())"],
                cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr[-500:]
        assert "ALL PASSED" in r.stdout


class TestFullModelCLI:
    def test_train_full_model(self, workdir, tmp_path):
        """--model full end-to-end (tiny 3-level variant via config) incl.
        full-family export bundle."""
        import yaml

        cfg = yaml.safe_load((REPO / "config/config.yaml").read_text())
        cfg.setdefault("model", {})["full"] = {"levels": 3, "base_channels": 8}
        cfgp = tmp_path / "full.yaml"
        cfgp.write_text(yaml.safe_dump(cfg))
        r = run([str(REPO / "train.py"), "--config", str(cfgp),
                 "--synthetic", "--platform", "cpu", "--model", "full",
                 "--frame_length", "64", "--nonlinear",
                 "--epochs", "1", "--batch_size", "16",
                 "--samples_per_epoch", "32", "--adv_weight", "0.1",
                 "--lr_d", "5e-5", "--n_critic", "2",
                 # isolated: must NOT overwrite the module workdir's MINI
                 # final_model, which TestEnhanceCLI loads later
                 "--checkpoint_dir", str(tmp_path / "ckpt_full"),
                 "--experiment", "cli_full"], cwd=workdir)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
        assert "Epoch 0:" in r.stdout
        meta = json.loads(
            (workdir / "export" / "generator" / "metadata.json").read_text())
        assert "enc1_1" in meta["layers"] and "final" in meta["layers"]


    def test_train_full_model_fused_decoder(self, workdir, tmp_path):
        """--model full --fused_decoder: the fused k=2-pair decoder as the
        TRAINING forward (round 5; models/unet_infer.py), eval/checkpoint
        still on the flax module — same param tree."""
        import yaml

        cfg = yaml.safe_load((REPO / "config/config.yaml").read_text())
        cfg.setdefault("model", {})["full"] = {"levels": 3, "base_channels": 8}
        cfgp = tmp_path / "full_fused.yaml"
        cfgp.write_text(yaml.safe_dump(cfg))
        r = run([str(REPO / "train.py"), "--config", str(cfgp),
                 "--synthetic", "--platform", "cpu", "--model", "full",
                 "--frame_length", "64", "--fused_decoder",
                 "--epochs", "1", "--batch_size", "16",
                 "--samples_per_epoch", "32", "--n_critic", "2",
                 "--checkpoint_dir", str(tmp_path / "ckpt_full_fused"),
                 "--skip_export", "--experiment", "cli_full_fused"],
                cwd=workdir)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
        assert "Epoch 0:" in r.stdout
        # the mini families must refuse the flag
        r2 = run([str(REPO / "train.py"), "--config",
                  str(REPO / "config/config.yaml"), "--synthetic",
                  "--platform", "cpu", "--epochs", "1", "--batch_size", "8",
                  "--samples_per_epoch", "16", "--fused_decoder",
                  "--skip_export", "--experiment", "cli_fused_bad"],
                 cwd=workdir)
        assert r2.returncode != 0
        assert "fused_decoder" in (r2.stderr + r2.stdout)

    def test_train_pipeline_parallel(self, workdir, tmp_path):
        """--strategy pp: the GPipe pipeline (parallel/pipeline.py) reachable
        from the product CLI — supervised full-U-Net recipe over a pp=2 mesh
        on the virtual 8-device CPU backend, plus the loud rejection of
        adversarial configs (VERDICT r3 item 2)."""
        import yaml

        cfg = yaml.safe_load((REPO / "config/config.yaml").read_text())
        cfg.setdefault("model", {})["full"] = {"levels": 3, "base_channels": 8}
        cfgp = tmp_path / "full_pp.yaml"
        cfgp.write_text(yaml.safe_dump(cfg))
        common = [str(REPO / "train.py"), "--config", str(cfgp),
                  "--synthetic", "--platform", "cpu", "--model", "full",
                  "--frame_length", "64", "--nonlinear",
                  "--strategy", "pp", "--pp", "2", "--microbatches", "4",
                  "--epochs", "2", "--batch_size", "16",
                  "--samples_per_epoch", "32", "--skip_export",
                  "--checkpoint_dir", str(tmp_path / "ckpt_pp")]
        r = run(common + ["--n_critic", "0", "--adv_weight", "0",
                          "--experiment", "cli_pp"], cwd=workdir)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
        assert "Epoch 1:" in r.stdout
        assert (tmp_path / "ckpt_pp" / "final_model").exists()

        # adversarial configs must be rejected loudly, not mistrained
        r2 = run(common + ["--n_critic", "2", "--experiment", "cli_pp_bad"],
                 cwd=workdir)
        assert r2.returncode != 0
        assert "SUPERVISED" in (r2.stderr + r2.stdout)

    def test_benchmark_full_model(self, workdir):
        """benchmark_comparison --model full: tiny frame so the 5-level U-Net
        stays cheap on CPU; untrained-weights path (the reference's own
        'architecture verification' mode, benchmark_comparison.py:398-400)."""
        r = run([str(REPO / "benchmark_comparison.py"), "--platform", "cpu",
                 "--model", "full", "--frame_length", "64", "--nonlinear",
                 # explicit nonexistent checkpoint: the default path holds the
                 # MINI checkpoint from earlier tests in this shared workdir,
                 # which cannot restore into the full U-Net
                 "--checkpoint", str(workdir / "no_such_ckpt"),
                 "--n_trials", "2", "--snr_min", "10", "--snr_max", "10",
                 "--snr_step", "30", "--output_dir", str(workdir / "bench_full")],
                cwd=workdir, timeout=900)
        assert r.returncode == 0, (r.stdout[-1200:], r.stderr[-2000:])
        assert "Non-Linear Impairments" in r.stdout
        # quantized deployment paths are mini-only
        r2 = run([str(REPO / "benchmark_comparison.py"), "--platform", "cpu",
                  "--model", "full", "--quantized"], cwd=workdir)
        assert r2.returncode != 0


class TestEnhanceCLI:
    def test_enhance_float_and_int(self, workdir, tmp_path):
        rng = np.random.default_rng(0)
        np.save(tmp_path / "in_ncl.npy",
                (rng.normal(size=(20, 16, 2)) * 0.3).astype(np.float32))
        np.save(tmp_path / "in_ref.npy",
                (rng.normal(size=(20, 2, 16)) * 0.3).astype(np.float32))
        ckpt = workdir / "checkpoints" / "final_model"
        r = run([str(REPO / "enhance.py"), "--checkpoint", str(ckpt),
                 "--input", str(tmp_path / "in_ncl.npy"),
                 "--output", str(tmp_path / "out1.npy"), "--platform", "cpu"],
                cwd=workdir)
        assert r.returncode == 0, r.stderr[-1500:]
        assert np.load(tmp_path / "out1.npy").shape == (20, 16, 2)
        # reference layout preserved + integer datapath
        r2 = run([str(REPO / "enhance.py"), "--checkpoint", str(ckpt),
                  "--input", str(tmp_path / "in_ref.npy"),
                  "--output", str(tmp_path / "out2.npy"), "--int_mode", "rtl"],
                 cwd=workdir)
        assert r2.returncode == 0, r2.stderr[-1500:]
        out2 = np.load(tmp_path / "out2.npy")
        assert out2.shape == (20, 2, 16) and np.isfinite(out2).all()


class TestBenchGuard:
    def test_bench_dead_tunnel_emits_contract_line(self, tmp_path):
        """bench.py must never hang when the axon tunnel relay is dead
        (CLAUDE.md gotcha: the relay can die mid-session and backend init
        then blocks forever; sitecustomize pins jax to axon via the config
        API, so this is bench's default path regardless of env). With the
        relay port pointed at a closed port it must fail FAST with one
        parseable JSON line carrying the driver-contract keys."""
        import socket
        with socket.socket() as s:  # grab an ephemeral port, release it:
            s.bind(("127.0.0.1", 0))  # the connect below is then refused
            port = s.getsockname()[1]
        env = {**os.environ, "OFDMGAN_RELAY_PORT": str(port)}
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], cwd=tmp_path,
            env=env, capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 2, (r.returncode, r.stdout, r.stderr[-800:])
        line = json.loads(r.stdout.strip().splitlines()[-1])
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in line, line
        assert line["value"] == 0.0 and "unreachable" in line["error"]

    def test_bench_bare_pallas_flag_accepted(self, tmp_path):
        """`bench.py --pallas_datagen` must run bare: the r4 default flip
        turned on flat-only knobs (--mm tf32x3_gp, --premap) that the
        pallas study paths must downgrade — not ap.error on — since those
        paths bench the [B, L, 2] layout (regression: r4 queue 5)."""
        env = {**os.environ, "OFDMGAN_TEST_PLATFORM": "cpu"}
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--pallas_datagen",
             "--platform", "cpu", "--batch", "64", "--scan_steps", "2",
             "--watchdog", "240"],
            cwd=tmp_path, env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert r.returncode == 0, (r.returncode, r.stderr[-800:])
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["value"] > 0, line
        assert "ignoring flat-only" in r.stderr
