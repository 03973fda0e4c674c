"""Public enums and type taxonomy.

TPU-native re-design of the reference's enum surface
(/root/reference/include/ceres/types.h:359-395 and friends). Enum→string
round-tripping mirrors /root/reference/internal/ceres/types.cc.
"""
from __future__ import annotations

import enum


class _StrEnum(enum.Enum):
    def __str__(self) -> str:  # CAUCHY -> "CAUCHY"
        return self.name

    @classmethod
    def parse(cls, s: "str | _StrEnum") -> "_StrEnum":
        if isinstance(s, cls):
            return s
        try:
            return cls[str(s).upper()]
        except KeyError:
            raise ValueError(f"Unknown {cls.__name__}: {s!r}") from None


class LinearSolverType(_StrEnum):
    """Which linear solver computes the trust-region step.

    Mirrors the 7 solver types dispatched by the reference factory
    (/root/reference/internal/ceres/linear_solver.cc:75-123).
    """

    DENSE_QR = enum.auto()
    DENSE_NORMAL_CHOLESKY = enum.auto()
    SPARSE_NORMAL_CHOLESKY = enum.auto()
    DENSE_SCHUR = enum.auto()
    SPARSE_SCHUR = enum.auto()
    ITERATIVE_SCHUR = enum.auto()
    CGNR = enum.auto()


class PreconditionerType(_StrEnum):
    IDENTITY = enum.auto()
    JACOBI = enum.auto()
    SCHUR_JACOBI = enum.auto()
    SCHUR_POWER_SERIES_EXPANSION = enum.auto()
    CLUSTER_JACOBI = enum.auto()
    CLUSTER_TRIDIAGONAL = enum.auto()
    SUBSET = enum.auto()


class MinimizerType(_StrEnum):
    TRUST_REGION = enum.auto()
    LINE_SEARCH = enum.auto()


class TrustRegionStrategyType(_StrEnum):
    LEVENBERG_MARQUARDT = enum.auto()
    DOGLEG = enum.auto()


class DoglegType(_StrEnum):
    TRADITIONAL_DOGLEG = enum.auto()
    SUBSPACE_DOGLEG = enum.auto()


class LineSearchDirectionType(_StrEnum):
    STEEPEST_DESCENT = enum.auto()
    NONLINEAR_CONJUGATE_GRADIENT = enum.auto()
    LBFGS = enum.auto()
    BFGS = enum.auto()


class NonlinearConjugateGradientType(_StrEnum):
    FLETCHER_REEVES = enum.auto()
    POLAK_RIBIERE = enum.auto()
    HESTENES_STIEFEL = enum.auto()


class LineSearchType(_StrEnum):
    ARMIJO = enum.auto()
    WOLFE = enum.auto()


class LineSearchInterpolationType(_StrEnum):
    BISECTION = enum.auto()
    QUADRATIC = enum.auto()
    CUBIC = enum.auto()


class TerminationType(_StrEnum):
    """Why the solver stopped (/root/reference/include/ceres/types.h:359-395)."""

    CONVERGENCE = enum.auto()
    NO_CONVERGENCE = enum.auto()
    FAILURE = enum.auto()
    USER_SUCCESS = enum.auto()
    USER_FAILURE = enum.auto()


class CallbackReturnType(_StrEnum):
    SOLVER_CONTINUE = enum.auto()
    SOLVER_ABORT = enum.auto()
    SOLVER_TERMINATE_SUCCESSFULLY = enum.auto()


class LinearSolverTerminationType(_StrEnum):
    """Inner linear-solve outcome taxonomy
    (/root/reference/internal/ceres/linear_solver.h:57-74). FAILURE shrinks the
    trust region and retries; FATAL_ERROR aborts the solve."""

    SUCCESS = enum.auto()
    NO_CONVERGENCE = enum.auto()
    FAILURE = enum.auto()
    FATAL_ERROR = enum.auto()


class LoggingType(_StrEnum):
    SILENT = enum.auto()
    PER_MINIMIZER_ITERATION = enum.auto()


class CovarianceAlgorithmType(_StrEnum):
    DENSE_SVD = enum.auto()
    SPARSE_QR = enum.auto()


class NumericDiffMethodType(_StrEnum):
    CENTRAL = enum.auto()
    FORWARD = enum.auto()
    RIDDERS = enum.auto()


class VisibilityClusteringType(_StrEnum):
    CANONICAL_VIEWS = enum.auto()
    SINGLE_LINKAGE = enum.auto()


# Linear solvers that exploit the e/f Schur partition.
SCHUR_SOLVERS = frozenset(
    {
        LinearSolverType.DENSE_SCHUR,
        LinearSolverType.SPARSE_SCHUR,
        LinearSolverType.ITERATIVE_SCHUR,
    }
)


def is_schur_type(t: LinearSolverType) -> bool:
    return t in SCHUR_SOLVERS
