"""Test configuration: force an 8-device virtual CPU mesh.

TPU hardware in CI may be a single chip (or absent); sharding tests run on
XLA's host-platform device simulation, per SURVEY.md §4.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a tunneled TPU): unit
# tests must be fast and deterministic; the bench exercises real hardware.
# NOTE: a sitecustomize may import jax before this file runs, so setting the
# env var alone is not enough — update the live jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache under tests: CPU AOT executables cached by
# other processes may carry mismatched machine-feature sets (SIGILL risk),
# and tests must not depend on cache state.
os.environ["AIP_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Tests measured >= ~20 s on the CI box (full-suite --durations, r4). The
# fast tier (`pytest -m "not slow"`, ~15 min) keeps every pipeline
# smoke-covered: test_training_step_decreases_loss stays fast-tier as the
# designated train-loop smoke. Re-derive with
# `pytest --durations=80` after adding expensive tests.
SLOW_TESTS = {
    "test_predict_sh_sharded_style_branch_matches",
    "test_sharded_gaussian_render_matches_replicated",
    "test_train_loop_on_mesh_matches_single_device",
    "test_render_entrypoint_sharded_matches_replicated",
    "test_train_with_logging_and_checkpoint",
    "test_rvq_qat_phase_trains_codebooks",
    "test_fit_train_selection_records_shape",
    "test_gaussian_sharded_single_view_step_matches",
    "test_recompact_in_training_loop",
    "test_batched_guide_prepass_non_multiple_of_8",
    "test_batched_guide_prepass_matches_serial",
    "test_recompact_step_equivalence",
    "test_network_gui_in_training_loop",
    "test_full_train_pipeline",
    "test_train_save_render_pipeline",
    "test_views_per_step_loop",
    "test_view_chunked_step_matches_flat_vmap",
    "test_recompact_regrows_after_densify",
    "test_render_video_cli",
    "test_batched_step_matches_mean_gradient",
    "test_multichip_gs_step_matches_single_device",
    "test_multiview_recovers_ground_truth_scene",
    "test_streamed_composite_train_step_matches_xla",
    "test_convert_full_pipeline_args",
    "test_gaussian_sharded_colorfield_step_matches",
    "test_dp_tp_step_matches_single_device",
    "test_densification_fires_at_default_threshold",
    "test_hash_encode_mxu_matches_autodiff_mixed_dense_hashed",
    "test_distillation_reduces_loss",
    "test_midas_architecture_and_depth_hook",
    "test_swin_extractor_shapes",
    "test_tp_actually_shards_conv_channels",
    "test_style_transfer_densenet_runs",
    "test_deeplab_segmenter_registration",
    "test_hash_encode_sg_matches_autodiff",
    "test_style_transfer_swin_runs",
    "test_densenet_extractor_shapes",
    "test_convert_cli",
    "test_densenet121_converter_matches_torch_mirror",
    "test_opacity_cull_exact_and_reduces_demand",
    "test_convert_resize_pyramid",
    "test_hash_grad_pallas_matches_scatter",
    "test_deeplab_converter_matches_torch_mirror",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
