#!/usr/bin/env python3
"""CWGAN-GP training CLI — flag-compatible with the reference's train.py.

Reference surface (train.py:541-568): --config --epochs --batch_size --lr
--resume --experiment --synthetic --skip_export --export_only
--export_checkpoint --export_dir --nonlinear --pa_saturation, plus
TPU-native extras (--samples_per_epoch --scan_steps --dp --seed --platform).

The reference's non-synthetic image-dataset path maps to --image_dir (host
image decode -> on-device channel simulation); with neither flag given,
synthetic data is used, matching the reference's fallback (train.py:654-657).
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser(description="Train CWGAN-GP for OFDM (TPU-native)")
    parser.add_argument("--config", type=str, default="config/config.yaml")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--init_from", type=str, default=None,
                        help="warm-start model params from a checkpoint with "
                             "FRESH optimizers/schedules/epoch (stage change, "
                             "e.g. GAN finetune after supervised pretraining); "
                             "contrast --resume, which restores everything")
    parser.add_argument("--experiment", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="Use synthetic on-device data (default when no image dir)")
    parser.add_argument("--image_chunks", action="store_true",
                        help="with --image_dir: train on ALL aligned "
                             "16-sample chunks of the full QAM16/64-sc "
                             "transmissions with noisy-max normalization — "
                             "the image-transmission simulator's exact "
                             "enhancement protocol (signal/image_ofdm."
                             "ImageOFDMChunkDataset)")
    parser.add_argument("--image_dir", type=str, default=None,
                        help="Train on image-derived OFDM frames from this directory")
    parser.add_argument("--skip_export", action="store_true")
    parser.add_argument("--export_only", action="store_true")
    parser.add_argument("--export_checkpoint", type=str, default=None)
    parser.add_argument("--export_dir", type=str, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="override paths.checkpoint_dir")
    parser.add_argument("--channel", type=str, default=None,
                        choices=["awgn", "rayleigh", "rician", "multipath"],
                        help="training channel model (default: config YAML's "
                             "channel.channel_type, i.e. awgn)")
    parser.add_argument("--nonlinear", action="store_true",
                        help="Enable PA/IQ-imbalance/phase-noise impairments")
    parser.add_argument("--pa_saturation", type=float, default=0.8)
    # TPU-native extras
    parser.add_argument("--samples_per_epoch", type=int, default=None)
    parser.add_argument("--scan_steps", type=int, default=None)
    parser.add_argument("--dp", type=int, default=None, help="data-parallel mesh size (0=all devices)")
    parser.add_argument("--strategy", choices=["shard_map", "gspmd", "pp"],
                        default="shard_map",
                        help="multi-device strategy: shard_map = explicit dp "
                             "collectives (default); gspmd = pjit with "
                             "compiler-inserted collectives (enables "
                             "--tp/--sp); pp = GPipe pipeline parallelism "
                             "over the U-Net's encode|decode seam "
                             "(SUPERVISED path only: requires --model full "
                             "--n_critic 0 --adv_weight 0; see --pp/"
                             "--microbatches and docs/SCALING.md)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel mesh size (Megatron U-Net kernel "
                             "sharding; requires --strategy gspmd --model full)")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel mesh size (frame-length-sharded "
                             "activations with GSPMD conv halo exchanges; "
                             "requires --strategy gspmd)")
    parser.add_argument("--pp", type=int, default=0,
                        help="pipeline-parallel mesh size (GPipe stages; the "
                             "U-Net splits into 2 stages, so --pp 2; "
                             "0 = min(devices, 2); requires --strategy pp)")
    parser.add_argument("--microbatches", type=int, default=8,
                        help="GPipe microbatches per step for --strategy pp "
                             "(batch_size must be divisible by this)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu) before backend init")
    # multi-process distributed training (SURVEY.md §5.8; no reference
    # counterpart — the reference is single-process)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="jax.distributed coordinator address host:port "
                             "(process 0 hosts the service)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--local_devices", type=int, default=None,
                        help="force this process onto N virtual CPU devices "
                             "(multi-process testing without a pod)")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a JAX profiler trace of N step dispatches before training")
    parser.add_argument("--nan_policy", choices=["restore_best", "raise", "ignore"],
                        default="restore_best")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (trap the first NaN-producing op; "
                             "the framework's sanitizer knob, SURVEY.md 5.2)")
    parser.add_argument("--pallas_datagen", action="store_true",
                        help="use the fused Pallas datagen kernel (linear-AWGN config)")
    parser.add_argument("--qat", action="store_true",
                        help="quantization-aware training: Q1.7 weight / Q8.8 "
                             "activation STE so the exported fixed-point ROM is "
                             "faithful to the trained model")
    parser.add_argument("--model", choices=["mini", "full"], default="mini",
                        help="model family: mini (16-sample, 258-param) or the "
                             "full 1024-sample 5-level U-Net (3.94M params, "
                             "reference export/generator/metadata.json)")
    parser.add_argument("--frame_length", type=int, default=None,
                        help="override ofdm.frame_length (default 16 for mini, "
                             "1024 for --model full)")
    parser.add_argument("--lr_d", type=float, default=None,
                        help="discriminator lr override (decoupled from --lr)")
    parser.add_argument("--n_critic", type=int, default=None,
                        help="critic updates per generator update override; "
                             "0 = supervised FAST PATH (requires "
                             "--adv_weight 0): skips all critic/GP compute, "
                             "bit-exact same generator trajectory as "
                             "n_critic>0 at adv_weight 0")
    parser.add_argument("--adv_weight", type=float, default=None,
                        help="adversarial loss weight override (0 = supervised "
                             "L1-only pretraining; the critic still trains)")
    parser.add_argument("--rec_weight", type=float, default=None,
                        help="reconstruction (L1) loss weight override")
    parser.add_argument("--lr_step", type=int, default=None,
                        help="StepLR decay interval in epochs override "
                             "(reference scheduler.step_size, config.yaml)")
    parser.add_argument("--lr_gamma", type=float, default=None,
                        help="StepLR decay factor override (scheduler.gamma)")
    parser.add_argument("--residual", action="store_true",
                        help="input-level residual generator head (y = x + "
                             "f(x), no tanh): removes the identity-map "
                             "ceiling of the reference architecture at the "
                             "same param budget; departs the RTL contract "
                             "(mini model only)")
    parser.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                        help="maintain an EMA of generator weights with this "
                             "per-step decay (e.g. 0.999) and validate it "
                             "alongside the raw weights; 0 disables")
    parser.add_argument("--matmul_precision",
                        choices=["float32", "tensorfloat32", "bfloat16",
                                 "bf16_tf32gp", "bf16_f32gp"],
                        default="float32",
                        help="MXU matmul precision for the train step "
                             "(float32 is the validated-stable default; see "
                             "results/RESULTS.md on bf16 collapse; the "
                             "bf16_*gp modes run bf16 everywhere except the "
                             "gradient-penalty chain)")
    parser.add_argument("--act_dtype", default=None,
                        choices=["bfloat16", "float8_e4m3fn", "float8_e5m2"],
                        help="activation STORAGE dtype for the train step "
                             "(params, matmul accumulation and optimizer "
                             "state stay float32; halves HBM traffic of the "
                             "memory-bound step — see results/RESULTS.md "
                             "§bf16 storage). float8_* halves it again: "
                             "tensors are STORED fp8 and read into the "
                             "validated bf16-operand/f32-accumulate matmul "
                             "(exact upcast); experimental — stability "
                             "evidence in results/RESULTS.md §fp8 storage")
    parser.add_argument("--flat", action="store_true",
                        help="mini model only: train with the flat-layout "
                             "[B, F] applies (folded upsample/concat/pool, "
                             "matmul-form datagen — the bench.py --flat fast "
                             "path; same param tree, parity-tested in "
                             "tests/test_flat_model.py). Checkpoints/eval/"
                             "export are unchanged")
    parser.add_argument("--mm", default="ambient",
                        choices=["ambient", "tf32x3", "tf32x3_gp"],
                        help="flat-apply matmul implementation (requires "
                             "--flat): 'tf32x3' pins every model dot to the "
                             "explicit bf16x3 MXU decomposition "
                             "(models/flat.tf32_matmul); 'tf32x3_gp' keeps "
                             "model dots ambient and pins JUST the gradient-"
                             "penalty chain to tf32x3 (the bench.py fastest "
                             "on-chip config)")
    parser.add_argument("--premap", action="store_true",
                        help="expansion-once flat step (requires --flat): "
                             "build the Toeplitz dense matrices ONCE per "
                             "parameter value per loss instead of once per "
                             "apply site; pair with --conv_expand onehot "
                             "for the scatter-free band-sum backward (the "
                             "bench.py --premap r4 headline config)")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the model applies inside the "
                             "fused step (recompute activations in backward "
                             "instead of storing; same function, see "
                             "training/wgan_gp.build_train_step)")
    parser.add_argument("--critic_unroll", type=int, default=1,
                        help="unroll factor for the n_critic inner scan "
                             "(pure codegen, identical numerics)")
    parser.add_argument("--prng", default="threefry",
                        choices=["threefry", "rbg", "unsafe_rbg"],
                        help="PRNG implementation: 'rbg'/'unsafe_rbg' "
                             "generate bulk bits with the TPU-native "
                             "RngBitGenerator instead of 20+ threefry "
                             "rounds per element (same recipe statistics, "
                             "different stream — see bench.py --prng)")
    parser.add_argument("--fused_decoder", action="store_true",
                        help="full U-Net TRAINING forward with the fused "
                             "k=2-pair decoder (models/unet_infer.py): the "
                             "upsample+conv identity is exact, hence "
                             "differentiable — 8 instead of 12 Cin*Cout*L "
                             "decoder MACs and no materialized NN-upsample "
                             "broadcast. --model full only; composes with "
                             "--act_dtype bfloat16. NOTE: pair with "
                             "--matmul_precision tensorfloat32/bfloat16 — "
                             "at full float32 the interleaved k=2 convs hit "
                             "a pathological remote-XLA compile (>18 min, "
                             "scripts/r5_fused_decoder_twin.sh header)")
    parser.add_argument("--conv_expand", default="dus",
                        choices=["dus", "onehot"],
                        help="Toeplitz expansion impl (ops/dense_conv.py): "
                             "'onehot' replaces the .at[].add() chain + "
                             "backward scatter-add with one fused "
                             "multiply-reduce against a constant 0/1 "
                             "placement tensor — bit-exact same dense "
                             "matrix (see bench.py --conv_expand)")
    parser.add_argument("--quant_bits", type=int, nargs=2, default=None,
                        metavar=("WEIGHT_BITS", "ACT_BITS"),
                        help="full model only: quantization-aware training "
                             "under the int8 per-channel export semantics "
                             "(e.g. --quant_bits 8 16)")
    parser.add_argument("--rtl_qat", action="store_true",
                        help="train against the RTL's exact op semantics (slope "
                             "0.3125, clamp tanh, center-tap output conv) + QAT, "
                             "making the deployed hardware datapath itself the "
                             "trained function")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.coordinator or args.num_processes:
        from ofdmgan_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id,
                   local_cpu_devices=args.local_devices)
        print(f"Distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    from ofdmgan_tpu.config import load_config

    config = load_config(args.config)
    if args.epochs:
        config.setdefault("training", {})["epochs"] = args.epochs
    if args.batch_size:
        config.setdefault("training", {})["batch_size"] = args.batch_size
    if args.lr:
        opt = config.setdefault("training", {}).setdefault("optimizer", {})
        opt["lr_generator"] = args.lr
        opt["lr_discriminator"] = args.lr
    if args.lr_d:
        opt = config.setdefault("training", {}).setdefault("optimizer", {})
        opt["lr_discriminator"] = args.lr_d
    if args.n_critic is not None:
        config.setdefault("training", {})["n_critic"] = args.n_critic
    if args.adv_weight is not None:
        config.setdefault("training", {}).setdefault("loss", {})["adversarial_weight"] = args.adv_weight
    if args.rec_weight is not None:
        config.setdefault("training", {}).setdefault("loss", {})["reconstruction_weight"] = args.rec_weight
    if args.lr_step is not None:
        config.setdefault("training", {}).setdefault("scheduler", {})["step_size"] = args.lr_step
    if args.lr_gamma is not None:
        config.setdefault("training", {}).setdefault("scheduler", {})["gamma"] = args.lr_gamma
    if args.residual:
        if args.model == "full":
            parser.error("--residual applies to the mini generator")
        # with --rtl_qat this trains the RTL-RESIDUAL hardware datapath
        # (deployable via intsim/fixsim mode "rtl_residual")
        config.setdefault("model", {}).setdefault("generator", {})["input_residual"] = True
    if args.channel:
        config.setdefault("channel", {})["channel_type"] = args.channel
    if args.model == "full" and args.frame_length is None:
        args.frame_length = 1024
    if args.frame_length:
        config.setdefault("ofdm", {})["frame_length"] = args.frame_length
    if args.skip_export:
        config["export_after_training"] = False
    if args.export_dir:
        config.setdefault("paths", {})["export_dir"] = args.export_dir
    if args.checkpoint_dir:
        config.setdefault("paths", {})["checkpoint_dir"] = args.checkpoint_dir

    # ---- export-only mode (train.py:591-613)
    if args.export_only:
        if not args.export_checkpoint or not os.path.exists(args.export_checkpoint):
            raise FileNotFoundError(
                "--export_only requires --export_checkpoint pointing to a valid checkpoint dir"
            )
        import jax
        import orbax.checkpoint as ocp
        from pathlib import Path
        from ofdmgan_tpu.quant.export import export_full_unet, export_generator

        restored = ocp.PyTreeCheckpointer().restore(str(Path(args.export_checkpoint).absolute()))
        params_g = restored["params_g"] if "params_g" in restored else restored
        export_dir = Path(config.get("paths", {}).get("export_dir", "./export"))
        export_dir.mkdir(parents=True, exist_ok=True)
        print(f"Exporting weights from checkpoint: {args.export_checkpoint}")
        print(f"Writing to: {export_dir / 'generator'}")
        inner = params_g.get("params", params_g)
        if "enc1_1" in inner:  # full U-Net family (reference metadata.json layout)
            export_full_unet(params_g, str(export_dir / "generator"))
        else:
            export_generator(params_g, str(export_dir / "generator"))
        print("Export complete.")
        return

    from ofdmgan_tpu.training.trainer import Trainer

    tpu_cfg = config.get("tpu", {})
    if args.image_dir:
        print(f"Using image-derived OFDM dataset from {args.image_dir}")
    else:
        print("Using synthetic OFDM dataset (fused on-device datagen)")
    if args.nonlinear:
        print(f"  Non-linear impairments ENABLED (PA sat={args.pa_saturation})")

    generator = discriminator = None
    if args.model == "full":
        if args.qat or args.rtl_qat:
            raise SystemExit("--qat/--rtl_qat apply to the mini (ROM-deployable) model only")
        from ofdmgan_tpu.models.full_unet import FullDiscriminator, FullUNetGenerator

        fl = config.get("ofdm", {}).get("frame_length", 1024)
        mcfg = config.get("model", {}).get("full", {})
        levels = mcfg.get("levels", 5)
        base = mcfg.get("base_channels", 32)
        qb = dict(zip(("weight_bits", "act_bits"), args.quant_bits)) \
            if args.quant_bits else {}
        generator = FullUNetGenerator(frame_length=fl, levels=levels,
                                      base_channels=base, **qb)
        discriminator = FullDiscriminator(frame_length=fl, levels=levels, base_channels=base)
    elif args.quant_bits:
        raise SystemExit("--quant_bits applies to the full model (mini QAT is --qat/--rtl_qat)")

    if args.conv_expand != "dus":
        from ofdmgan_tpu.ops import dense_conv
        dense_conv.CONV_EXPAND = args.conv_expand

    trainer = Trainer(
        config=config,
        generator=generator,
        discriminator=discriminator,
        nonlinear=args.nonlinear,
        pa_saturation=args.pa_saturation,
        samples_per_epoch=args.samples_per_epoch or tpu_cfg.get("samples_per_epoch", 10_000),
        scan_steps=args.scan_steps if args.scan_steps is not None else tpu_cfg.get("scan_steps", 0),
        data_parallel=args.dp if args.dp is not None else tpu_cfg.get("data_parallel", 0),
        strategy=args.strategy,
        tensor_parallel=args.tp,
        seq_parallel=args.sp,
        pipeline_parallel=args.pp,
        microbatches=args.microbatches,
        seed=args.seed,
        image_dir=args.image_dir,
        image_chunks=args.image_chunks,
        use_pallas_datagen=args.pallas_datagen,
        qat=args.qat or args.rtl_qat,
        rtl_faithful=args.rtl_qat,
        matmul_precision=args.matmul_precision,
        ema_decay=args.ema,
        act_dtype=args.act_dtype,
        flat_step=args.flat,
        premap=args.premap,
        mm=args.mm,
        critic_unroll=args.critic_unroll,
        remat=args.remat,
        prng=args.prng,
        fused_decoder=args.fused_decoder,
    )
    from ofdmgan_tpu.models import count_parameters

    print(f"Generator parameters: {count_parameters(trainer.state.params_g):,}")
    print(f"Discriminator parameters: {count_parameters(trainer.state.params_d):,}")

    trainer.nan_policy = args.nan_policy

    if args.resume:
        print(f"Resuming from {args.resume}")
        trainer.load_checkpoint(args.resume)
    elif args.init_from:
        if args.init_from.endswith(".npz"):
            # flat generator-only artifact (scripts/extract_champion.py):
            # warm-start G, keep the fresh critic/optimizers — the entry
            # point for GAN-finetuning a supervised champion
            import numpy as np

            print(f"Warm-starting GENERATOR from {args.init_from} "
                  f"(fresh critic + optimizers)")
            flat = np.load(args.init_from)
            pg = {}
            for p, arr in flat.items():
                node, keys = pg, p.split("/")
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                node[keys[-1]] = arr
            trainer.init_generator_params(pg)
        else:
            print(f"Warm-starting params from {args.init_from} (fresh optimizers)")
            trainer.init_params_from(args.init_from)

    if args.profile:
        path = trainer.profile_steps(args.profile)
        print(f"Profiler trace written to {path}")

    trainer.train(experiment_name=args.experiment, export_after=not args.skip_export)


if __name__ == "__main__":
    sys.exit(main())
