"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the reference validates hardware
without an FPGA (SURVEY.md §4.5): simulated devices. Env vars must be set
before jax initializes its backends, hence the top-level assignment.
"""

import os

# The session environment pins JAX_PLATFORMS to the real TPU backend; tests
# always run on the virtual CPU mesh unless explicitly overridden.
os.environ["JAX_PLATFORMS"] = os.environ.get("OFDMGAN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# sitecustomize may have imported jax already (registering the hardware
# backend), in which case the env var above came too late — force the
# platform through the config API, which takes effect as long as no backend
# has been initialized yet.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_threefry_partitionable", True)


# ----------------------------------------------------------- two-tier suite
# Tests measured >= ~12 s on the 8-device CPU mesh (pytest --durations=60,
# full-suite run recorded in round 4) are auto-marked ``slow`` so the
# default `pytest -q` fast tier finishes in <10 min; `pytest -q -m ""`
# runs the full ~38-min suite (see pyproject.toml addopts). Keeping the
# list here — one place, node-id granularity — makes it trivial to
# regenerate from a fresh --durations run.
_SLOW_TESTS = frozenset({
    # round-5 additions (multi-minute subprocess / training tests)
    "test_cli.py::TestFullModelCLI::test_train_full_model_fused_decoder",
    "test_prng_rbg.py::TestRbgCLI::test_train_prng_rbg_smoke",
    "test_flat_params.py::test_flat_params_trajectory_ulp_equivalent",
    "test_unet_infer.py::test_fused_decoder_trains_a_step",
    "test_unet_infer.py::test_fused_decoder_training_gradients_equivalent",
    "test_models.py::TestGenerator::test_frame_length_parametric",
    "test_cli.py::TestCLIs::test_train_and_resume_and_export",
    "test_distributed.py::test_two_process_gspmd_tensor_parallel",
    "test_cli.py::TestCLIs::test_train_fading_channel_residual",
    "test_cli.py::TestCLIs::test_selfcheck",
    "test_cli.py::TestFullModelCLI::test_train_full_model",
    "test_distributed.py::test_two_process_lockstep_with_single_process",
    "test_cli.py::TestFullModelCLI::test_train_pipeline_parallel",
    "test_cli.py::TestCLIs::test_benchmark_cli",
    "test_training.py::TestTrainStep::test_bf16_activation_storage_step",
    "test_cli.py::TestCLIs::test_test_models_script",
    "test_cli.py::TestCLIs::test_eval_checkpoint_and_extract_champion",
    "test_flat_model.py::TestTrainingParity::test_full_step_gp_closure",
    "test_flat_model.py::TestTrainingParity::test_full_step_remat",
    "test_training.py::TestTrainStep::test_outer_unroll_identical_numerics",
    "test_flat_model.py::TestTrainingParity::test_full_step_benched_config",
    "test_gspmd.py::TestGSPMD::test_full_unet_dp_sp_layout_equivalence",
    "test_training.py::TestTrainerGSPMD::test_gspmd_dp_tp_epoch_validate_resume",
    "test_packed_step.py::TestStepParity::test_bf16_storage_mixed_precision",
    "test_packed_step.py::TestStepParity::test_train_step_lockstep",
    "test_flat_model.py::TestTrainingParity::test_full_step_bf16_storage",
    "test_flat_model.py::TestTrainingParity::test_full_step_premap",
    "test_cli.py::TestCLIs::test_export_mini_weights_cli",
    "test_flat_model.py::TestTrainingParity::test_full_step_premap_gp_closure_headline",
    "test_trainer_export.py::TestTrainer::test_init_from_warm_starts_params_with_fresh_optimizer",
    "test_flat_model.py::TestTrainingParity::test_full_step_fp8_storage",
    "test_pallas_critic.py::TestFusedTrainStep::test_train_step_parity",
    "test_flat_model.py::TestTrainingParity::test_full_step_trajectory_matches",
    "test_qat.py::TestQATPayoff::test_qat_training_keeps_int_path_faithful",
    "test_cli.py::TestFullModelCLI::test_benchmark_full_model",
    "test_gspmd.py::TestGSPMD::test_mini_model_gspmd_matches_single_device",
    "test_trainer_export.py::TestTrainer::test_ema_tracks_saves_and_restores",
    "test_training.py::TestTrainStep::test_supervised_fast_path_bit_exact",
    "test_training.py::TestImageDatasetDP::test_image_dir_with_dp8",
    "test_training.py::TestTrainStep::test_loss_decreases_over_training",
    "test_pipeline.py::TestPipeline::test_pp_multi_step_trains",
    "test_flat_model.py::TestTrainerTf32x3GpMode::test_one_epoch_runs_and_learns",
    "test_benchmark.py::TestBenchmark::test_structure_and_sanity",
    "test_trainer_export.py::TestTrainer::test_two_epoch_run_with_export",
    "test_flat_model.py::TestTrainingParity::test_fp8_residual_head_and_fp8_flat_datagen",
    "test_cli.py::TestEnhanceCLI::test_enhance_float_and_int",
    "test_full_unet.py::TestQuantizedDeployment::test_qat_gradients_flow",
    "test_training.py::TestTrainStep::test_scan_steps_equivalent_count",
    "test_pipeline.py::TestPipeline::test_pp_matches_single_device_update",
    "test_pallas_critic.py::TestFusedCriticGrad::test_exact_parity_with_jax_grad",
    "test_packed_step.py::TestStepParity::test_scan_steps_and_p2",
    "test_training.py::TestShardedTrainStep::test_dp8_flat_bf16_headline_config",
    "test_trainer_export.py::TestTrainer::test_checkpoint_resume_roundtrip",
    "test_trainer_export.py::TestTrainer::test_dp_trainer",
    "test_gspmd.py::TestGSPMD::test_full_unet_dp_tp_train_step",
    "test_training.py::TestTrainStep::test_fresh_critic_batches_mode",
    "test_training.py::TestTrainStep::test_single_step_updates_params_and_metrics",
    "test_export_serving.py::test_full_model_export_small",
    "test_training.py::TestShardedTrainStep::test_dp8_runs_and_matches_semantics",
    "test_benchmark.py::TestBenchmark::test_nonlinear_floor",
    "test_full_unet.py::TestArchitecture::test_forward_shapes",
    "test_training.py::TestTrainerGSPMD::test_gspmd_dp_sp_epoch",
    "test_training.py::TestShardedTrainStep::test_2d_mesh_with_spare_axis",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        # node id relative to tests/, parametrization brackets stripped so
        # one entry covers all params of a test function
        key = item.nodeid.split("[", 1)[0]
        if key.startswith("tests/"):
            key = key[len("tests/"):]
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
