"""YAML config loading with reference-compatible keys.

The reference drives everything from one YAML (config/config.yaml:1-136)
merged with argparse overrides via setdefault (train.py:571-588). Same
behavior here: ``load_config`` returns a plain nested dict; helpers pull
typed sections with the reference's defaults so an empty config works
(train.py:146-185).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml

from .signal.channel import ChannelConfig
from .signal.datagen import DatagenConfig
from .signal.impairments import ImpairmentConfig
from .training.wgan_gp import LossConfig


def load_config(path: str | None) -> Dict[str, Any]:
    if path and os.path.exists(path):
        with open(path) as f:
            return yaml.safe_load(f) or {}
    return {}


def datagen_config_from(config: Dict[str, Any], nonlinear: bool = False,
                        pa_saturation: float = 0.8) -> DatagenConfig:
    ofdm = config.get("ofdm", {})
    chan = config.get("channel", {})
    snr_range = chan.get("snr_range", [0, 30])
    return DatagenConfig(
        frame_length=int(ofdm.get("frame_length", 16)),
        snr_min=float(snr_range[0]),
        snr_max=float(snr_range[1]),
        channel=ChannelConfig(kind=str(chan.get("channel_type", "awgn")).lower()),
        nonlinear=nonlinear,
        impairments=ImpairmentConfig(pa_saturation=pa_saturation),
    )


def loss_config_from(config: Dict[str, Any]) -> LossConfig:
    t = config.get("training", {})
    loss = t.get("loss", {})
    return LossConfig(
        n_critic=int(t.get("n_critic", 5)),
        gp_weight=float(t.get("gp_weight", 10.0)),
        adv_weight=float(loss.get("adversarial_weight", 1.0)),
        rec_weight=float(loss.get("reconstruction_weight", 100.0)),
    )


def training_params_from(config: Dict[str, Any]) -> Dict[str, Any]:
    t = config.get("training", {})
    opt = t.get("optimizer", {})
    sched = t.get("scheduler", {})
    log = config.get("logging", {})
    paths = config.get("paths", {})
    return {
        "epochs": int(t.get("epochs", 200)),
        "batch_size": int(t.get("batch_size", 32)),
        "lr_generator": float(opt.get("lr_generator", 1e-4)),
        "lr_discriminator": float(opt.get("lr_discriminator", 1e-4)),
        "betas": tuple(opt.get("betas", [0.0, 0.9])),
        "scheduler_step": int(sched.get("step_size", 50)),
        "scheduler_gamma": float(sched.get("gamma", 0.5)),
        "checkpoint_interval": int(t.get("checkpoint_interval", 10)),
        "save_best": bool(t.get("save_best", True)),
        "log_interval": int(log.get("log_interval", 100)),
        "checkpoint_dir": paths.get("checkpoint_dir", "./checkpoints"),
        "log_dir": paths.get("log_dir", "./logs"),
        "export_dir": paths.get("export_dir", "./export"),
    }
