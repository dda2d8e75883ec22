"""High-level trainer: epochs, validation, checkpoints, logging, export.

Behavioral parity target: reference train.py:62-536 (CWGANGPTrainer) —
epoch loop with per-epoch validation, StepLR schedules, periodic + best
checkpoints, TensorBoard scalars, post-training FPGA export — rebuilt
around the fused on-device train step (no DataLoader: datagen happens
inside the jitted step; an "epoch" is ``samples_per_epoch // batch_size``
outer steps, matching the reference's 10k-sample synthetic epochs).

Checkpoints are Orbax directories holding the full TrainState (params,
both optimizer states, step) plus a JSON sidecar with epoch/best-val/config
— the same resume contract as the reference (train.py:411-445).
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..config import datagen_config_from, loss_config_from, training_params_from
from ..models import MiniDiscriminator, MiniGenerator
from ..parallel import make_mesh, make_sharded_train_step, replicate_state
from ..signal.datagen import DatagenConfig
from ..utils.logging import MetricsLogger
from .schedules import make_adam
from .wgan_gp import LossConfig, TrainState, make_eval_step, make_train_step


class _NullLogger:
    """No-op logger for non-zero processes in multi-process runs."""

    dir = Path(".")

    def log_text(self, *a, **k):
        pass

    def log_scalars(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(
        self,
        config: Dict[str, Any] | None = None,
        nonlinear: bool = False,
        pa_saturation: float = 0.8,
        samples_per_epoch: int = 10_000,
        val_samples: int = 1_000,
        scan_steps: int = 0,
        data_parallel: int = 0,
        strategy: str = "shard_map",
        tensor_parallel: int = 1,
        seq_parallel: int = 1,
        pipeline_parallel: int = 0,
        microbatches: int = 8,
        seed: int = 0,
        image_dir: Optional[str] = None,
        samples_per_image: int = 10,
        use_pallas_datagen: bool = False,
        qat: bool = False,
        rtl_faithful: bool = False,
        generator=None,
        discriminator=None,
        matmul_precision: str = "float32",
        ema_decay: float = 0.0,
        act_dtype: Optional[str] = None,
        flat_step: bool = False,
        mm: str = "ambient",
        premap: bool = False,
        critic_unroll: int = 1,
        remat: bool = False,
        image_chunks: bool = False,
        prng: str = "threefry",
        fused_decoder: bool = False,
    ):
        """``generator``/``discriminator`` inject alternative model families
        (e.g. the full 1024-sample U-Net, models/full_unet.py) in place of
        the default mini pair; the rest of the training runtime (schedules,
        checkpoints, NaN policy, sharding) is model-agnostic."""
        self.config = config or {}
        self.tp = training_params_from(self.config)
        self.dg_cfg: DatagenConfig = datagen_config_from(self.config, nonlinear, pa_saturation)
        self.loss_cfg: LossConfig = loss_config_from(self.config)

        self.batch_size = self.tp["batch_size"]
        self.steps_per_epoch = max(1, samples_per_epoch // self.batch_size)
        self.val_batches = max(1, val_samples // self.batch_size)
        if scan_steps <= 0:
            scan_steps = min(self.steps_per_epoch, 32)
        # epoch length must be a whole number of scan chunks
        while self.steps_per_epoch % scan_steps:
            scan_steps -= 1
        self.scan_steps = scan_steps

        gcfg = self.config.get("model", {}).get("generator", {})
        dcfg = self.config.get("model", {}).get("discriminator", {})
        frame_length = self.dg_cfg.frame_length
        self.generator = generator if generator is not None else MiniGenerator(
            frame_length=frame_length,
            enc1_channels=gcfg.get("enc1_channels", 4),
            bottleneck_channels=gcfg.get("bottleneck_channels", 8),
            dec1_channels=gcfg.get("dec1_channels", 4),
            leaky_slope=gcfg.get("leaky_slope", 0.2),
            qat=qat,  # Q1.7/Q8.8 quantization-aware training
            rtl_faithful=rtl_faithful,
            input_residual=gcfg.get("input_residual", False),
            act_dtype=act_dtype,
        )
        self.discriminator = discriminator if discriminator is not None else MiniDiscriminator(
            frame_length=frame_length,
            conv1_channels=dcfg.get("conv1_channels", 8),
            conv2_channels=dcfg.get("conv2_channels", 16),
            leaky_slope=dcfg.get("leaky_slope", 0.2),
            act_dtype=act_dtype,
        )

        # StepLR in optimizer-update counts (G: 1/step; D: n_critic/step)
        decay_g = self.tp["scheduler_step"] * self.steps_per_epoch
        decay_d = decay_g * max(self.loss_cfg.n_critic, 1)  # n_critic=0: D never steps
        self.tx_g = make_adam(self.tp["lr_generator"], self.tp["betas"], decay_g, self.tp["scheduler_gamma"])
        self.tx_d = make_adam(self.tp["lr_discriminator"], self.tp["betas"], decay_d, self.tp["scheduler_gamma"])

        # 'rbg'/'unsafe_rbg' swap bulk bit generation onto the TPU-native
        # RngBitGenerator (the datagen draws are the largest fusions in the
        # flat step's optimized HLO, results/hlo_flat_fusions.json); the
        # typed key carries the impl to every downstream split/fold_in/draw.
        self._prng = prng
        key = (jax.random.PRNGKey(seed) if prng == "threefry"
               else jax.random.key(seed, impl=prng))
        x0 = np.zeros((1, frame_length, 2), np.float32)
        params_g = self.generator.init(key, x0)
        params_d = self.discriminator.init(key, x0, x0)
        self.state = TrainState.create(params_g, params_d, self.tx_g, self.tx_d)

        # image-backed data (the reference's OFDMDataset path): clean frames
        # derived from images, channel simulation on device (train.py:642-652)
        batch_fn = None
        if image_dir and image_chunks:
            # chunk-level distribution matched to the image-transmission
            # simulator's enhancement protocol (viz/image_transmission.py)
            from ..signal.image_ofdm import ImageOFDMChunkDataset

            self.image_dataset = ImageOFDMChunkDataset(
                image_dir,
                chunk=frame_length,
                snr_range=(self.dg_cfg.snr_min, self.dg_cfg.snr_max),
                samples_per_image=samples_per_image,
            )
            batch_fn = self.image_dataset.sample_batch
            print(f"Image CHUNK dataset: {len(self.image_dataset.image_files)} "
                  f"images, {int(self.image_dataset._chunks.shape[0])} chunks "
                  f"from {image_dir}")
        elif image_dir:
            from ..signal.image_ofdm import ImageOFDMDataset

            ofdm_cfg = self.config.get("ofdm", {})
            self.image_dataset = ImageOFDMDataset(
                image_dir,
                frame_length=frame_length,
                modulation=ofdm_cfg.get("modulation", "QPSK"),
                n_subcarriers=ofdm_cfg.get("num_subcarriers", 8),
                cp_length=ofdm_cfg.get("cp_length", 2),
                snr_range=(self.dg_cfg.snr_min, self.dg_cfg.snr_max),
                channel_type=self.dg_cfg.channel.kind,
                samples_per_image=samples_per_image,
            )
            batch_fn = self.image_dataset.sample_batch
            print(f"Image dataset: {len(self.image_dataset.image_files)} images "
                  f"from {image_dir}")

        # throughput mode (bench.py --flat): flat-layout [B, F] applies with
        # folded upsample/concat/pool, matmul-form datagen, optionally the
        # explicit bf16x3 dots (mm="tf32x3") — the same parameter tree and
        # (to rounding) the same functions, so eval/checkpoint/export paths
        # below keep using the flax modules untouched
        # (parity: tests/test_flat_model.py).
        train_gen_apply = self.generator.apply
        train_critic_apply = self.discriminator.apply
        critic_apply_gp = None
        self._gen_premap = self._critic_premap = None
        user_batch_fn = batch_fn  # image-dataset sampler (drives eval below)
        if flat_step:
            if qat or rtl_faithful or generator is not None:
                raise ValueError("flat_step supports the standard mini "
                                 "model family (float, tanh/residual head)")
            from ..models.flat import (make_critic_flat_apply,
                                       make_critic_flat_parts,
                                       make_generator_flat_apply,
                                       make_generator_flat_parts)

            # "tf32x3_gp" = ambient (bf16 under bf16_tf32gp) model dots with
            # JUST the gradient-penalty chain on explicit bf16x3 dots — the
            # bench.py --mm tf32x3_gp config (fastest measured on chip,
            # results/r3_perf_queue.jsonl)
            mm_model = "ambient" if mm == "tf32x3_gp" else mm
            gen_kw = dict(
                frame_length=frame_length,
                enc1_channels=gcfg.get("enc1_channels", 4),
                bottleneck_channels=gcfg.get("bottleneck_channels", 8),
                dec1_channels=gcfg.get("dec1_channels", 4),
                leaky_slope=gcfg.get("leaky_slope", 0.2),
                act_dtype=act_dtype,
                input_residual=gcfg.get("input_residual", False),
            )
            crit_kw = dict(
                frame_length=frame_length,
                conv1_channels=dcfg.get("conv1_channels", 8),
                conv2_channels=dcfg.get("conv2_channels", 16),
                leaky_slope=dcfg.get("leaky_slope", 0.2),
                act_dtype=act_dtype,
            )
            if premap:
                # expansion-once step (bench.py --premap, the r4 headline):
                # Toeplitz dense matrices built once per parameter value per
                # loss; pair with conv_expand='onehot' for the scatter-free
                # band-sum backward (ops/dense_conv.py)
                self._gen_premap, train_gen_apply = make_generator_flat_parts(
                    mm=mm_model, **gen_kw)
                self._critic_premap, train_critic_apply = \
                    make_critic_flat_parts(mm=mm_model, **crit_kw)
                if mm == "tf32x3_gp":
                    _, critic_apply_gp = make_critic_flat_parts(
                        mm="tf32x3", **crit_kw)
            else:
                train_gen_apply = make_generator_flat_apply(
                    mm=mm_model, **gen_kw)
                train_critic_apply = make_critic_flat_apply(
                    mm=mm_model, **crit_kw)
                if mm == "tf32x3_gp":
                    critic_apply_gp = make_critic_flat_apply(
                        mm="tf32x3", **crit_kw)
            if (batch_fn is None and not self.dg_cfg.nonlinear
                    and self.dg_cfg.channel.kind == "awgn"):
                from ..signal.datagen import synthetic_batch_flat

                dgc = self.dg_cfg
                batch_fn = lambda k, n: synthetic_batch_flat(k, n, dgc)
        elif mm != "ambient":
            raise ValueError("mm requires flat_step")
        elif premap:
            raise ValueError("premap requires flat_step")

        if fused_decoder:
            # Full-U-Net TRAINING forward with the fused k=2-pair decoder
            # (models/unet_infer.py): the upsample+conv(k=3) identity is
            # exact, hence differentiable — no NN-upsample broadcast is
            # materialized and the decoder convs drop from 12 to 8
            # Cin*Cout*L MACs. Same param tree; eval/checkpoint/export
            # below keep the flax module. act_dtype='bfloat16' composes
            # (bf16 activation+operand storage, f32 param cotangents).
            from ..models.full_unet import FullUNetGenerator
            from ..models.unet_infer import make_unet_infer_apply

            if not isinstance(self.generator, FullUNetGenerator) or qat \
                    or self.generator.weight_bits or self.generator.act_bits:
                raise ValueError("fused_decoder is the float full-U-Net "
                                 "training forward (--model full)")
            if flat_step:
                raise ValueError("fused_decoder and flat_step are different "
                                 "model families")
            if act_dtype not in (None, "bfloat16"):
                raise ValueError("fused_decoder supports f32 or bfloat16 "
                                 "activation storage (fp8 operands have no "
                                 "conv path)")
            train_gen_apply = make_unet_infer_apply(
                levels=self.generator.levels,
                leaky_slope=self.generator.leaky_slope,
                act_dtype=jnp.dtype(act_dtype) if act_dtype else jnp.float32,
                fused_decoder=True)

        self.mesh = None
        self._strategy = strategy
        self._state_shardings = None
        n_dev = len(jax.devices())
        if strategy == "gspmd":
            # GSPMD (pjit) path: dp x tp x sp mesh, XLA-inserted collectives
            # (parallel/gspmd.py). Supports the standard module step only —
            # the mini-specific levers (flat step, pallas datagen, unrolls,
            # remat, image datasets) stay on the shard_map/single paths.
            for flag, name in ((flat_step, "flat_step"), (remat, "remat"),
                               (use_pallas_datagen, "use_pallas_datagen"),
                               (critic_unroll != 1, "critic_unroll"),
                               (mm != "ambient", "mm"),
                               (user_batch_fn is not None, "image datasets")):
                if flag:
                    raise ValueError(f"strategy='gspmd' does not support {name}")
            if tensor_parallel > 1 and not hasattr(self.generator, "levels"):
                raise ValueError("tensor_parallel > 1 requires the full "
                                 "U-Net family (--model full): the Megatron "
                                 "sharding rule keys on its layer names")
            if data_parallel == 0:
                data_parallel = max(1, n_dev // (tensor_parallel * seq_parallel))
            axes = {"dp": data_parallel}
            if tensor_parallel > 1:
                axes["tp"] = tensor_parallel
            if seq_parallel > 1:
                axes["sp"] = seq_parallel
            from ..models.full_unet import unet_param_shardings
            from ..parallel import make_gspmd_train_step

            if tensor_parallel > 1 and seq_parallel > 1:
                # XLA SPMD miscompiles spatially-sharded convs with
                # tp-sharded kernels in BOTH Megatron forms (forward for
                # column-parallel, backward for row-parallel) — see
                # scripts/sp_tp_conv_repro.py and parallel/gspmd.py
                raise ValueError(
                    "sp x tp training is disabled (upstream XLA SPMD conv "
                    "miscompile — scripts/sp_tp_conv_repro.py, "
                    "docs/SCALING.md): use dp x sp or dp x tp")
            tp_rule = unet_param_shardings if tensor_parallel > 1 else None
            self.mesh = make_mesh(axes)
            make_state, self._step = make_gspmd_train_step(
                train_gen_apply, train_critic_apply,
                self.tx_g, self.tx_d, self.dg_cfg, self.loss_cfg,
                global_batch_size=self.batch_size, mesh=self.mesh,
                gen_tp_rule=tp_rule,
                scan_steps=self.scan_steps,
                matmul_precision=matmul_precision,
            )
            self.state = make_state(jax.device_get(self.state.params_g),
                                    jax.device_get(self.state.params_d))
            # remember each leaf's placement so resume/warm-start can put
            # restored host values back under the same shardings
            self._state_shardings = jax.tree_util.tree_map(
                lambda a: a.sharding, self.state)
        elif strategy == "pp":
            # GPipe pipeline parallelism over the pp axis (parallel/
            # pipeline.py): the SUPERVISED full-U-Net path only — the
            # builder raises loudly for adversarial configs.
            for flag, name in ((flat_step, "flat_step"),
                               (use_pallas_datagen, "use_pallas_datagen"),
                               (critic_unroll != 1, "critic_unroll"),
                               (mm != "ambient", "mm"),
                               # pp builds its stage functions from the flax
                               # module's encode/decode split, so the fused
                               # train_gen_apply cannot be consumed — reject
                               # rather than silently train the std forward
                               (fused_decoder, "fused_decoder"),
                               (user_batch_fn is not None, "image datasets")):
                if flag:
                    raise ValueError(f"strategy='pp' does not support {name}")
            if not hasattr(self.generator, "levels"):
                raise ValueError("strategy='pp' requires the full U-Net "
                                 "family (--model full): the pipeline splits "
                                 "on its encode|decode stage seam")
            pp = pipeline_parallel if pipeline_parallel > 0 else min(n_dev, 2)
            from ..parallel import make_pp_trainstate_step

            self.mesh = make_mesh({"pp": pp})
            self._step = make_pp_trainstate_step(
                self.generator, self.tx_g, self.dg_cfg, self.loss_cfg,
                global_batch_size=self.batch_size,
                microbatches=microbatches, mesh=self.mesh,
                scan_steps=self.scan_steps, remat=remat,
            )
            self.state = replicate_state(self.state, self.mesh)
        elif strategy != "shard_map":
            raise ValueError(f"unknown strategy {strategy!r} "
                             "(expected 'shard_map', 'gspmd' or 'pp')")
        elif tensor_parallel > 1 or seq_parallel > 1:
            raise ValueError("tensor_parallel/seq_parallel require "
                             "strategy='gspmd'")
        if data_parallel == 0:
            data_parallel = n_dev if n_dev > 1 else 1
        if strategy in ("gspmd", "pp"):
            pass  # step built above
        elif data_parallel > 1:
            self.mesh = make_mesh({"dp": data_parallel})
            self.state = replicate_state(self.state, self.mesh)
            self._step = make_sharded_train_step(
                train_gen_apply, train_critic_apply,
                self.tx_g, self.tx_d, self.dg_cfg, self.loss_cfg,
                global_batch_size=self.batch_size, mesh=self.mesh,
                scan_steps=self.scan_steps,
                matmul_precision=matmul_precision,
                batch_fn=batch_fn,
                act_dtype=act_dtype,
                critic_unroll=critic_unroll,
                gen_premap=self._gen_premap,
                critic_premap=self._critic_premap,
            )
            if remat:
                raise ValueError("remat is wired for the single-device "
                                 "step; drop --remat with dp>1")
            if critic_apply_gp is not None:
                raise ValueError("mm='tf32x3_gp' is wired for the "
                                 "single-device step; drop it with dp>1")
        else:
            self._step = make_train_step(
                train_gen_apply, train_critic_apply,
                self.tx_g, self.tx_d, self.dg_cfg, self.loss_cfg,
                batch_size=self.batch_size, scan_steps=self.scan_steps,
                use_pallas_datagen=use_pallas_datagen, batch_fn=batch_fn,
                matmul_precision=matmul_precision,
                act_dtype=act_dtype,
                critic_unroll=critic_unroll,
                remat=remat,
                critic_apply_gp=critic_apply_gp,
                gen_premap=self._gen_premap,
                critic_premap=self._critic_premap,
            )
        # validation always evaluates the canonical flax module on the
        # standard [B, L, 2] eval pipeline, so flat-step runs stay directly
        # comparable to every other run (the param tree is shared and the
        # flat applies match the module to rounding)
        if user_batch_fn is not None:
            batch_fn = user_batch_fn
            gen_apply = self.generator.apply
            bsz = self.batch_size

            @jax.jit
            def _image_eval(params_g, key):
                import jax.numpy as jnp

                batch = batch_fn(key, bsz)
                fake = gen_apply(params_g, batch["noisy"])
                return {
                    "rec_loss": jnp.mean(jnp.abs(fake - batch["clean"])),
                    "mse": jnp.mean((fake - batch["clean"]) ** 2),
                }

            self._eval = _image_eval
        else:
            self._eval = make_eval_step(self.generator.apply, self.dg_cfg, self.batch_size)

        # Exponential moving average of generator weights (StyleGAN-style;
        # no reference counterpart — the reference evaluates raw weights).
        # The EMA is maintained per dispatched scan chunk with the per-step
        # decay compounded (decay**scan_steps), i.e. an exact EMA of the
        # chunk-boundary parameter trajectory.
        self.ema_decay = float(ema_decay)
        self.ema_params_g = None
        if self.ema_decay > 0.0:
            # independent host copy: the fused step DONATES the train state,
            # so aliasing state.params_g here would leave the EMA tree
            # pointing at deleted device buffers after the first step
            self.ema_params_g = jax.tree_util.tree_map(
                np.asarray, jax.device_get(self.state.params_g))
            d_chunk = self.ema_decay ** self.scan_steps

            @jax.jit
            def _ema_update(ema, params):
                return jax.tree_util.tree_map(
                    lambda e, p: d_chunk * e + (1.0 - d_chunk) * p, ema, params)

            self._ema_update = _ema_update

        # multi-process: only process 0 writes checkpoints/logs (all
        # processes hold identical replicated state, so nothing is lost)
        self.is_main_process = jax.process_index() == 0
        self.current_epoch = 0
        self.best_val_loss = float("inf")
        self.logger: Optional[MetricsLogger] = None
        self._key = (jax.random.PRNGKey(seed + 1) if prng == "threefry"
                     else jax.random.key(seed + 1, impl=prng))
        self._ckptr = ocp.PyTreeCheckpointer()
        # failure detection (SURVEY.md §5.3 role): what to do when training
        # metrics go non-finite. "restore_best" reloads the best checkpoint
        # and stops; "raise" raises; "ignore" continues.
        self.nan_policy = "restore_best"
        self._last_best_path: Optional[str] = None

    # ------------------------------------------------------------------ utils
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------- public API
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        metrics = {}
        for _ in range(self.steps_per_epoch // self.scan_steps):
            self.state, metrics = self._step(self.state, self._next_key())
            if self.ema_params_g is not None:
                self.ema_params_g = self._ema_update(self.ema_params_g,
                                                     self.state.params_g)
        return {k: float(v) for k, v in metrics.items()}

    def profile_steps(self, n_chunks: int = 2, trace_dir: Optional[str] = None) -> str:
        """Capture a JAX profiler trace of ``n_chunks`` fused step dispatches
        (the rebuild's profiling hook, SURVEY.md §5.1). View with
        TensorBoard's profile plugin or xprof."""
        trace_dir = trace_dir or str(
            (self.logger.dir if self.logger else Path(self.tp["log_dir"])) / "profile"
        )
        with jax.profiler.trace(trace_dir):
            for _ in range(n_chunks):
                self.state, _ = self._step(self.state, self._next_key())
            jax.block_until_ready(self.state)
        return trace_dir

    def validate(self) -> Dict[str, float]:
        totals = {"rec_loss": 0.0, "mse": 0.0}
        if self.ema_params_g is not None:
            totals.update({"rec_loss_ema": 0.0, "mse_ema": 0.0})
        for _ in range(self.val_batches):
            k = self._next_key()
            m = self._eval(self.state.params_g, k)
            totals["rec_loss"] += float(m["rec_loss"])
            totals["mse"] += float(m["mse"])
            if self.ema_params_g is not None:
                me = self._eval(self.ema_params_g, k)  # same val key: paired
                totals["rec_loss_ema"] += float(me["rec_loss"])
                totals["mse_ema"] += float(me["mse"])
        return {k: v / self.val_batches for k, v in totals.items()}

    def save_checkpoint(self, path: str, is_best: bool = False):
        """Full-state checkpoint + sidecar (train.py:411-430)."""
        if not self.is_main_process:
            return
        path = Path(path).absolute()
        if path.exists():
            shutil.rmtree(path)
        state = jax.device_get(self.state)
        self._ckptr.save(str(path), state)
        if self.ema_params_g is not None:
            self._ckptr.save(str(path / "ema_params_g"),
                             jax.device_get(self.ema_params_g))
        sidecar = {
            "epoch": self.current_epoch,
            "global_step": int(state.step),
            "best_val_loss": self.best_val_loss,
            "config": self.config,
        }
        (path / "trainer_state.json").write_text(json.dumps(sidecar, indent=2))
        if is_best:
            best = path.parent / "best_model"
            if best.exists():
                shutil.rmtree(best)
            shutil.copytree(path, best)
            self._last_best_path = str(best)

    def _place_state(self, state: TrainState) -> TrainState:
        """Re-place a (host or freshly built) TrainState under the run's
        layout: GSPMD shardings captured at init, shard_map replication, or
        as-is on a single device."""
        if self._state_shardings is not None:  # gspmd
            return jax.device_put(jax.device_get(state), self._state_shardings)
        if self.mesh is not None:
            return replicate_state(state, self.mesh)
        return state

    def init_params_from(self, path: str):
        """Warm-start ONLY the model parameters from a checkpoint: fresh
        optimizer states, schedule position 0, epoch 0. This is the right
        entry into a new training stage (e.g. GAN finetune after supervised
        pretraining) — plain resume would keep the previous stage's Adam
        moments and an already-decayed LR schedule position."""
        path = Path(path).absolute()
        template = jax.device_get(self.state)
        loaded = self._ckptr.restore(str(path), item=template)
        self.state = self._place_state(TrainState.create(
            loaded.params_g, loaded.params_d, self.tx_g, self.tx_d))
        if self.ema_params_g is not None:
            self.ema_params_g = jax.tree_util.tree_map(
                np.asarray, jax.device_get(loaded.params_g))

    def init_generator_params(self, params_g):
        """Warm-start ONLY the generator from a bare param tree (e.g. a flat
        .npz champion artifact): fresh critic, fresh optimizers, schedule
        position 0 — the GAN-finetune entry for supervised champions."""
        template = jax.device_get(self.state.params_g)
        params_g = jax.tree_util.tree_map(
            lambda t, v: np.asarray(v, dtype=np.asarray(t).dtype),
            template, params_g)
        self.state = self._place_state(TrainState.create(
            params_g, jax.device_get(self.state.params_d),
            self.tx_g, self.tx_d))
        if self.ema_params_g is not None:
            self.ema_params_g = jax.tree_util.tree_map(np.asarray, params_g)

    def load_checkpoint(self, path: str):
        """Resume everything incl. optimizer/schedule state (train.py:432-445)."""
        path = Path(path).absolute()
        template = jax.device_get(self.state)
        state = self._ckptr.restore(str(path), item=template)
        self.state = self._place_state(state)
        ema_path = path / "ema_params_g"
        if self.ema_params_g is not None:
            if ema_path.exists():
                self.ema_params_g = self._ckptr.restore(
                    str(ema_path), item=jax.device_get(template.params_g))
            else:
                # Resuming a run trained WITHOUT --ema: re-seed the EMA from
                # the restored generator params rather than keeping the
                # init-time random copy (advisor finding, round 2).
                self.ema_params_g = jax.tree_util.tree_map(
                    np.asarray, jax.device_get(state.params_g))
        sidecar = json.loads((path / "trainer_state.json").read_text())
        self.current_epoch = sidecar["epoch"]
        self.best_val_loss = sidecar["best_val_loss"]

    def train(self, epochs: Optional[int] = None, experiment_name: Optional[str] = None,
              export_after: bool = True) -> TrainState:
        epochs = epochs or self.tp["epochs"]
        self.logger = MetricsLogger(self.tp["log_dir"], experiment_name,
                                    tensorboard=self.config.get("logging", {}).get("tensorboard", True)) \
            if self.is_main_process else _NullLogger()
        self.logger.log_text("config", json.dumps(self.config, indent=2, default=str))
        ckpt_dir = Path(self.tp["checkpoint_dir"]).absolute()
        if self.is_main_process:
            ckpt_dir.mkdir(parents=True, exist_ok=True)

        print(f"Training for {epochs} epochs | batch {self.batch_size} | "
              f"{self.steps_per_epoch} steps/epoch (scan {self.scan_steps}) | "
              f"n_critic {self.loss_cfg.n_critic} | gp {self.loss_cfg.gp_weight} | "
              f"rec {self.loss_cfg.rec_weight} | devices {len(jax.devices())}")
        t0 = time.time()
        for epoch in range(self.current_epoch, epochs):
            self.current_epoch = epoch
            tm = self.train_epoch(epoch)
            if not all(np.isfinite(v) for v in tm.values()):
                msg = f"non-finite training metrics at epoch {epoch}: {tm}"
                if self.nan_policy == "raise":
                    raise FloatingPointError(msg)
                print(f"FAILURE DETECTED: {msg}")
                if self.nan_policy == "restore_best" and self._last_best_path:
                    print(f"Restoring best checkpoint {self._last_best_path} and stopping.")
                    self.load_checkpoint(self._last_best_path)
                    break
                if self.nan_policy == "restore_best":
                    print("No best checkpoint yet; stopping.")
                    break
            vm = self.validate()
            step = int(jax.device_get(self.state.step))
            self.logger.log_scalars("train", {
                "d_loss": tm["d_loss"], "g_loss": tm["g_loss"],
                "wasserstein": tm["wasserstein_distance"],
                "rec_loss": tm["rec_loss"], "gp": tm["gradient_penalty"],
            }, step)
            self.logger.log_scalars("val", vm, epoch)
            ema_txt = (f" | EMA L1 {vm['rec_loss_ema']:.4f}"
                       if "rec_loss_ema" in vm else "")
            print(f"Epoch {epoch}: D {tm['d_loss']:.4f} G {tm['g_loss']:.4f} "
                  f"W {tm['wasserstein_distance']:.4f} L1 {tm['rec_loss']:.4f} | "
                  f"val L1 {vm['rec_loss']:.4f} MSE {vm['mse']:.4f}{ema_txt}")

            if (epoch + 1) % self.tp["checkpoint_interval"] == 0:
                self.save_checkpoint(str(ckpt_dir / f"checkpoint_epoch_{epoch+1}"))
            # best-model tracking considers the EMA generator too (the
            # checkpoint carries both parameter sets)
            val_best = min(vm["rec_loss"], vm.get("rec_loss_ema", float("inf")))
            if self.tp["save_best"] and val_best < self.best_val_loss:
                self.best_val_loss = val_best
                self.save_checkpoint(str(ckpt_dir / f"checkpoint_epoch_{epoch+1}"), is_best=True)

        print(f"Training complete in {(time.time()-t0)/3600:.2f} hours")
        self.save_checkpoint(str(ckpt_dir / "final_model"))

        if export_after and self.config.get("export_after_training", True) \
                and self.is_main_process:
            from ..models.full_unet import FullUNetGenerator
            from ..quant.export import export_full_unet, export_generator

            export_dir = Path(self.tp["export_dir"]) / "generator"
            print(f"Exporting weights for FPGA to {export_dir} ...")
            params_g = jax.device_get(self.state.params_g)
            if isinstance(self.generator, FullUNetGenerator):
                export_full_unet(params_g, str(export_dir))
            else:
                export_generator(params_g, str(export_dir))

        self.logger.close()
        return self.state
