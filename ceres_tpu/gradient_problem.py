"""General unconstrained minimization: GradientProblem + solver.

TPU-native equivalent of /root/reference/include/ceres/gradient_problem.h:92,
gradient_problem_solver.{h,cc} (:99-167) and
internal/ceres/gradient_problem_evaluator.h. The user supplies a
jax-traceable scalar function; the gradient comes from reverse-mode AD
(cheapest for scalar outputs) instead of a hand-written
FirstOrderFunction::Evaluate, and an optional manifold handles
tangent-space descent.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .manifolds import EuclideanManifold, Manifold
from .options import Options
from .summary import Summary
from .types import MinimizerType, TerminationType


class GradientProblem:
    """fn(x) -> scalar cost, jax-traceable; optional manifold.

    `gradient` optionally supplies a hand-coded (or finite-difference)
    ambient gradient fn(x) -> (n,), the FirstOrderFunction::Evaluate
    analog; reverse-mode AD is used when omitted."""

    def __init__(self, fn: Callable, num_parameters: int,
                 manifold: Optional[Manifold] = None,
                 gradient: Optional[Callable] = None):
        self.fn = fn
        self.gradient = gradient
        self.num_parameters = num_parameters
        self.manifold = manifold
        if manifold is not None and manifold.ambient_size != num_parameters:
            raise ValueError("manifold ambient size mismatch")

    @property
    def num_tangent_parameters(self) -> int:
        return self.manifold.tangent_size if self.manifold else self.num_parameters


class _GradientProgram:
    """Adapter exposing the CompiledProgram evaluation surface so the
    LineSearchMinimizer runs unchanged (gradient_problem_evaluator.h)."""

    def __init__(self, gp: GradientProblem):
        self.gp = gp
        self.tangent_size = gp.num_tangent_parameters
        self.state_size = gp.num_parameters
        fn = gp.fn
        manifold = gp.manifold

        user_grad = gp.gradient

        def eval_core(x, with_grad, dense):
            if with_grad:
                if user_grad is not None:
                    c, g_ambient = fn(x), user_grad(x)
                else:
                    c, g_ambient = jax.value_and_grad(fn)(x)
                if manifold is not None:
                    g = manifold.plus_jacobian(x).T @ g_ambient
                else:
                    g = g_ambient
                return {"cost": c, "residuals": jnp.zeros((0,)), "gradient": g}
            return {"cost": fn(x), "residuals": jnp.zeros((0,))}

        self._eval_core = eval_core
        self._minimizer_cache = {}

    def _plus_impl(self, x, delta):
        if self.gp.manifold is not None:
            return self.gp.manifold.plus(x, delta)
        return x + delta

    def has_bounds(self):
        return False

    def write_state(self, x):
        pass


def solve_gradient_problem(
    options: Options, problem: GradientProblem, parameters: np.ndarray,
    summary: Optional[Summary] = None,
) -> Summary:
    """gradient_problem_solver.cc:99 Solve equivalent; `parameters` is
    updated in place."""
    from .solvers.fused_line_search import build_fused_line_search
    from .solvers.line_search import LineSearchMinimizer

    if summary is None:
        summary = Summary()
    t0 = time.monotonic()
    summary.minimizer_type = MinimizerType.LINE_SEARCH
    summary.num_parameters = problem.num_parameters
    summary.num_effective_parameters = problem.num_tangent_parameters
    summary.fixed_cost = 0.0

    # fast path: repeated solves of the same GradientProblem reuse the
    # jitted evaluators and cached fused minimizer
    program = getattr(problem, "_cached_program", None)
    if program is None:
        program = _GradientProgram(problem)
        problem._cached_program = program
    summary.preprocessor_time_in_seconds = time.monotonic() - t0
    t1 = time.monotonic()
    minimizer = build_fused_line_search(program, options, summary)
    if minimizer is None:
        minimizer = LineSearchMinimizer(program, options, summary)
    x = minimizer.minimize(jnp.asarray(parameters))
    summary.minimizer_time_in_seconds = time.monotonic() - t1
    parameters[...] = np.asarray(x)
    summary.final_cost = minimizer.x_cost
    summary.total_time_in_seconds = time.monotonic() - t0
    return summary
