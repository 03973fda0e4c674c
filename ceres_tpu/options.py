"""Solver options + validation.

Mirrors /root/reference/include/ceres/solver.h:61-816 (Solver::Options) and
the validation compatibility matrix in /root/reference/internal/ceres/solver.cc:99-480
— adapted to the TPU backend set: the EIGEN/LAPACK/SuiteSparse/CUDA library
switches collapse into one XLA tier, and `use_mixed_precision_solves`
(solver.h:572-590) becomes the main performance axis (fp32 factor + fp64
iterative refinement rides the MXU; fp64 on TPU is emulated).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence

from .types import (
    DoglegType,
    LineSearchDirectionType,
    LineSearchInterpolationType,
    LineSearchType,
    LinearSolverType,
    LoggingType,
    MinimizerType,
    NonlinearConjugateGradientType,
    PreconditionerType,
    TrustRegionStrategyType,
    VisibilityClusteringType,
    is_schur_type,
)


@dataclasses.dataclass
class Options:
    # Minimizer choice
    minimizer_type: MinimizerType = MinimizerType.TRUST_REGION
    trust_region_strategy_type: TrustRegionStrategyType = (
        TrustRegionStrategyType.LEVENBERG_MARQUARDT
    )
    dogleg_type: DoglegType = DoglegType.TRADITIONAL_DOGLEG

    # Line search config (solver.h:81-260)
    line_search_direction_type: LineSearchDirectionType = LineSearchDirectionType.LBFGS
    line_search_type: LineSearchType = LineSearchType.WOLFE
    nonlinear_conjugate_gradient_type: NonlinearConjugateGradientType = (
        NonlinearConjugateGradientType.FLETCHER_REEVES
    )
    max_lbfgs_rank: int = 20
    use_approximate_eigenvalue_bfgs_scaling: bool = False
    line_search_interpolation_type: LineSearchInterpolationType = (
        LineSearchInterpolationType.CUBIC
    )
    min_line_search_step_size: float = 1e-9
    line_search_sufficient_function_decrease: float = 1e-4
    max_line_search_step_contraction: float = 1e-3
    min_line_search_step_contraction: float = 0.6
    max_num_line_search_step_size_iterations: int = 20
    max_num_line_search_direction_restarts: int = 5
    line_search_sufficient_curvature_decrease: float = 0.9
    max_line_search_step_expansion: float = 10.0

    # Trust region config
    use_nonmonotonic_steps: bool = False
    max_consecutive_nonmonotonic_steps: int = 5
    max_num_iterations: int = 50
    max_solver_time_in_seconds: float = 1e9
    initial_trust_region_radius: float = 1e4
    max_trust_region_radius: float = 1e16
    min_trust_region_radius: float = 1e-32
    min_relative_decrease: float = 1e-3
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32
    max_num_consecutive_invalid_steps: int = 5
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-8
    jacobi_scaling: bool = True

    # Residual/Jacobian evaluation precision: "float64" (reference parity,
    # emulated on TPU), "float32" (TPU-native; solver state and control
    # flow stay fp64), or "mixed" — the whole-solve analog of the
    # reference's mixed-precision axis (dense_cholesky.h:198-249): run
    # the f32 tier to its own plateau at TPU speed, then polish with up
    # to `mixed_precision_polish_iterations` f64 iterations from that
    # iterate; reaches the f64 golden cost at a fraction of the all-f64
    # wall time. BA-class problems tolerate fp32; NIST needs fp64.
    evaluation_dtype: str = "float64"
    # f64 polish budget for evaluation_dtype="mixed".
    mixed_precision_polish_iterations: int = 5

    # Fused minimizer loop (solvers/fused_lm.py): run the ENTIRE LM loop —
    # evaluation, linear step, accept/reject, radius update, tolerances —
    # as one lax.while_loop in a single jit, with the Jacobian carried
    # across iterations in flattened 2-D lanes. "AUTO" uses it for large
    # problems when the configuration is in the fused subset (LM strategy,
    # no bounds/callbacks/inner-iterations, device-resident linear solver);
    # "ALWAYS"/"NEVER" force it on/off.
    fused_loop: str = "AUTO"
    # AUTO threshold: problems with at least this many residuals use the
    # fused loop (below it, per-iteration dispatch is cheap and the host
    # loop keeps full feature coverage with lower compile latency).
    fused_loop_min_residuals: int = 8192

    # Linear solver
    linear_solver_type: LinearSolverType = LinearSolverType.SPARSE_NORMAL_CHOLESKY
    preconditioner_type: PreconditionerType = PreconditionerType.JACOBI
    visibility_clustering_type: VisibilityClusteringType = (
        VisibilityClusteringType.CANONICAL_VIEWS
    )
    use_explicit_schur_complement: bool = False
    use_mixed_precision_solves: bool = False
    max_num_refinement_iterations: int = 0
    min_linear_solver_iterations: int = 0
    max_linear_solver_iterations: int = 500
    use_spse_initialization: bool = False
    max_num_spse_iterations: int = 5
    spse_tolerance: float = 0.1
    eta: float = 1e-1
    dynamic_sparsity: bool = False

    # Ordering: list of lists of parameter-block handles/arrays; group 0
    # eliminated first (Schur e-blocks). None = automatic (MIS).
    linear_solver_ordering: Optional[List[List[Any]]] = None
    residual_blocks_for_subset_preconditioner: Optional[Sequence[int]] = None

    # Inner iterations (Ruhe & Wedin Alg. II, solver.h:634-715)
    use_inner_iterations: bool = False
    inner_iteration_tolerance: float = 1e-3
    inner_iteration_ordering: Optional[List[List[Any]]] = None

    # Threads: accepted for API parity; intra-device parallelism is XLA's.
    num_threads: int = 1

    # Logging / callbacks
    logging_type: LoggingType = LoggingType.PER_MINIMIZER_ITERATION
    minimizer_progress_to_stdout: bool = False
    callbacks: List[Callable] = dataclasses.field(default_factory=list)
    update_state_every_iteration: bool = False
    evaluation_callback: Optional[Any] = None  # .prepare_for_evaluation(...)

    # Gradient checking (solver.cc:768-780)
    check_gradients: bool = False
    gradient_check_relative_precision: float = 1e-8
    gradient_check_numeric_derivative_relative_step_size: float = 1e-6

    # Problem dumps (solver.h:725-735)
    trust_region_minimizer_iterations_to_dump: List[int] = dataclasses.field(
        default_factory=list
    )
    trust_region_problem_dump_directory: str = "/tmp"

    def is_valid(self) -> "tuple[bool, str]":
        """Validation mirroring solver.cc:99-480 where applicable."""
        for name, lo in [
            ("max_num_iterations", 0),
            ("max_solver_time_in_seconds", 0.0),
            ("function_tolerance", 0.0),
            ("gradient_tolerance", 0.0),
            ("parameter_tolerance", 0.0),
            ("max_consecutive_nonmonotonic_steps", 1),
        ]:
            if getattr(self, name) < lo:
                return False, f"Options::{name} must be >= {lo}"
        for name in [
            "initial_trust_region_radius",
            "max_trust_region_radius",
            "min_trust_region_radius",
            "min_relative_decrease",
            "min_lm_diagonal",
            "max_lm_diagonal",
            "eta",
        ]:
            if getattr(self, name) <= 0:
                return False, f"Options::{name} must be > 0"
        if self.evaluation_dtype not in ("float64", "float32", "mixed"):
            return False, (
                "Options::evaluation_dtype must be one of "
                "'float64', 'float32', 'mixed'")
        if self.min_trust_region_radius > self.max_trust_region_radius:
            return False, "min_trust_region_radius > max_trust_region_radius"
        if self.min_lm_diagonal > self.max_lm_diagonal:
            return False, "min_lm_diagonal > max_lm_diagonal"
        if self.minimizer_type == MinimizerType.TRUST_REGION:
            if (
                self.trust_region_strategy_type == TrustRegionStrategyType.DOGLEG
                and self.linear_solver_type
                in (LinearSolverType.ITERATIVE_SCHUR, LinearSolverType.CGNR)
            ):
                return (
                    False,
                    "DOGLEG only supports exact factorization-based linear solvers",
                )
        if self.minimizer_type == MinimizerType.LINE_SEARCH:
            if self.line_search_direction_type in (
                LineSearchDirectionType.BFGS, LineSearchDirectionType.LBFGS
            ) and self.line_search_type != LineSearchType.WOLFE:
                return (
                    False,
                    "BFGS/LBFGS line search directions require WOLFE line "
                    "search (Armijo does not guarantee the curvature "
                    "condition needed for a valid secant update)",
                )
        if is_schur_type(self.linear_solver_type) and self.linear_solver_ordering is not None:
            if any(len(g) == 0 for g in self.linear_solver_ordering):
                return False, "linear_solver_ordering contains an empty group"
        if self.use_mixed_precision_solves and self.linear_solver_type in (
            LinearSolverType.ITERATIVE_SCHUR,
            LinearSolverType.CGNR,
        ):
            return False, "mixed precision solves not supported with iterative solvers"
        if self.dynamic_sparsity and self.linear_solver_type != (
            LinearSolverType.SPARSE_NORMAL_CHOLESKY
        ):
            # solver.cc:300-316: dynamic sparsity is a
            # SPARSE_NORMAL_CHOLESKY-only mode
            return False, (
                "dynamic_sparsity is only supported with "
                "SPARSE_NORMAL_CHOLESKY"
            )
        return True, ""
