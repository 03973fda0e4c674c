"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (the analog of the reference's generated
thread-matrix tests, SURVEY.md §4.8).

Note: this environment's sitecustomize force-registers the TPU backend and
overrides jax_platforms, so setting the env var alone is not enough — we
update the config after import, before any backend is initialized by tests.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Fast/slow tiers: the fused one-jit loops and interpret-mode Pallas tests
# dominate wall time (30-200 s each, almost all XLA compile). Mark them
# `slow` so `pytest -m "not slow"` gives a <3 min fast tier on 8-way xdist;
# CI runs everything.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_fused_kernel_matvec_matches_flatops",
    "test_libmv_reader_and_solve",
    "test_lm_step_schur_v2_matches_v1_interpret",
    "test_schur_core_spread_kernel_interpret",
    "test_fused_spse_preconditioner",
    "test_fused_bounds_constrained_mgh",
    "test_iterative_schur_preconditioner_matrix",
    "test_fused_cluster_preconditioners",
    "test_fused_dense_schur_mixed_precision",
    "test_flat_schur_ops_match_partition",
    "test_fused_identity_preconditioner",
    "test_fused_spse_initialization",
    "test_fused_matches_host_trajectory",
    "test_cluster_tridiagonal_exact_solve",
    "test_flat_paths_reach_reference_cost",
    "test_fused_bounds_matches_host",
    "test_explicit_schur_complement_matches_reference",
    "test_fused_interpolation_types",
    "test_fused_f32_evaluation",
    "test_fused_nonmonotonic",
    "test_schur_assembly_kernel_interpret",
    "test_fused_dense_qr",
    "test_batched_matches_per_block",
    "test_fused_explicit_schur_complement",
    "test_fused_pallas_tier_interpret",
    "test_cluster_tridiagonal_empty_forest_matches_jacobi",
    "test_flat_mixed_sizes_and_constants",
    "test_fused_dogleg_matches_host",
    "test_fused_dogleg_subspace_matches_host",
    "test_windowed_matvec_interpret",
    "test_point_sharded_state_is_partitioned_and_matches_replicated",
    "test_fused_line_search_matches_host",
    "test_isc_matvec_kernel_interpret",
    "test_normal_matvec_kernel_interpret",
    "test_lm_step_schur_pallas_plan_matches_scatter",
    "test_lm_step_schur_matches_dense_reference",
    "test_lm_step_schur_k_matches_stepwise",
    "test_point_sharded_uneven_tracks",
    "test_fully_sharded_lm_matches_single_device",
    "test_robust_loss_rejects_outliers",
    "test_ba_solver_config_matrix",
    "test_flat_jacobian_ops_match_bsr",
    "test_covariance_sparse_qr_selected_blocks",
    "test_sharded_ba_reduces_cost",
    "test_sharded_fused_lm_matches_single_device",
    "test_sparse_normal_cholesky_end_to_end",
    "test_sharded_ba_lm_matches_unsharded",
    "test_dynamic_sparsity_matches_static",
    "test_mixed_precision_sparse_end_to_end",
    "test_fused_max_iterations_termination",
    "test_ridders_high_accuracy",
    "test_3d_slam_converges_unit_quaternions",
    "test_generic_sharded_evaluator_matches_single_device",
    "test_minus_jacobian_times_plus_jacobian_is_identity",
    "test_denoising_small_crop",
    "test_generic_sharded_with_manifolds_and_loss",
    "test_dense_schur_solve_matches_full_normal_equations",
    "test_batched_sharded_evaluation",
    "test_cgnr_end_to_end_matches_dense_qr",
    "test_max_iterations_no_convergence",
    "test_batched_writes_back_into_2d_arrays",
    "test_batched_with_manifold_and_bounds",
    "test_fused_line_search_nlls_problem",
    "test_autodiff_jacobians_match_numeric_central",
    "test_covariance_qr_multi_block_matches_svd",
    "test_fused_gradient_problem_with_manifold",
    "test_auto_threshold_picks_host_for_small_problems",
    "test_2d_slam_converges_and_closes_loops",
    "test_evaluation_dtype_float32",
    "test_sharded_evaluation_is_deterministic",
    "test_segment_spread_sum_ftf_interpret",
    "test_minus_jacobian_matches_autodiff",
    "test_plus_jacobian_matches_autodiff",
    "test_evaluation_callback_invoked",
    "test_inner_iterations_converge",
    "test_jt_mode_multitile_gradient_parity",
    "test_jt_mode_quaternion_manifold_parity",
    "test_jt_mode_quaternion_solve_matches_host",
    "test_inner_iterations_fused_matches_host",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
