"""ceres_tpu — a TPU-native sparse nonlinear least-squares framework.

Brand-new design with the capabilities of Ceres Solver (reference at
/root/reference): batched forward-mode autodiff instead of Jet templates,
static compiled programs instead of pointer graphs, XLA/Pallas kernels
instead of threaded CPU loops and CUDA, jax.sharding meshes instead of a
thread pool.

Reference semantics are double precision throughout (the solver state and
factorizations); we therefore enable jax x64 at import. Hot kernels
downcast internally where mixed precision is requested.
"""
import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .cost_function import (  # noqa: E402
    AnalyticCostFunction,
    AutoDiffCostFunction,
    ConditionedCostFunction,
    CostFunction,
    NormalPrior,
    NumericDiffCostFunction,
    cost_function_to_functor,
)
from .loss import (  # noqa: E402
    ArctanLoss,
    CauchyLoss,
    ComposedLoss,
    HuberLoss,
    LossFunction,
    LossFunctionWrapper,
    ScaledLoss,
    SoftLOneLoss,
    TolerantLoss,
    TrivialLoss,
    TukeyLoss,
)
from .manifolds import (  # noqa: E402
    AutoDiffManifold,
    EigenQuaternionManifold,
    EuclideanManifold,
    LineManifold,
    Manifold,
    ProductManifold,
    QuaternionManifold,
    SphereManifold,
    SubsetManifold,
)
from .callbacks import EvaluationCallback, IterationCallback  # noqa: E402
from .covariance import Covariance, CovarianceOptions  # noqa: E402
from .cubic_interpolation import (  # noqa: E402
    BiCubicInterpolator,
    CubicInterpolator,
    Grid1D,
    Grid2D,
)
from .gradient_checker import GradientChecker  # noqa: E402
from .gradient_problem import GradientProblem, solve_gradient_problem  # noqa: E402
from .tiny_solver import TinySolver, TinySolverOptions, TinySolverSummary  # noqa: E402
from .options import Options  # noqa: E402
from .problem import Problem  # noqa: E402
from .solver import solve  # noqa: E402
from .summary import IterationSummary, Summary  # noqa: E402
from .types import (  # noqa: E402
    CallbackReturnType,
    CovarianceAlgorithmType,
    DoglegType,
    LineSearchDirectionType,
    LineSearchInterpolationType,
    LineSearchType,
    NonlinearConjugateGradientType,
    LinearSolverTerminationType,
    LinearSolverType,
    LoggingType,
    MinimizerType,
    NumericDiffMethodType,
    PreconditionerType,
    TerminationType,
    TrustRegionStrategyType,
)

__version__ = "0.1.0"
