"""Line search minimizer: LBFGS / BFGS / nonlinear CG / steepest descent
with Armijo and strong-Wolfe searches.

TPU-native equivalent of the reference's line-search stack
(/root/reference/internal/ceres/line_search_minimizer.cc:87,
line_search.cc 884 LoC (ArmijoLineSearch/WolfeLineSearch with
bisection/quadratic/cubic interpolation), line_search_direction.cc:342,
low_rank_inverse_hessian.cc:62 (LBFGS two-loop)). Cost+gradient come from
one fused jitted evaluation; the scalar search logic runs host-side, as in
the reference.
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..options import Options
from ..summary import IterationSummary, Summary
from ..types import (
    LineSearchDirectionType,
    LineSearchInterpolationType,
    LineSearchType,
    NonlinearConjugateGradientType,
    TerminationType,
)
from ..utils.polynomial import (
    FunctionSample,
    minimize_interpolating_polynomial,
)


class LineSearchFunction:
    """phi(s) = f(x + s d), phi'(s) = g(x + s d) . d (line_search.h
    LineSearchFunction); evaluations through the program's fused kernel."""

    def __init__(self, program):
        self.program = program
        p = program

        @jax.jit
        def eval_vg(x, d, s):
            xp = p._plus_impl(x, s * d)
            o = p._eval_core(xp, True, False)
            return o["cost"], jnp.dot(o["gradient"], d)

        @jax.jit
        def eval_v(x, d, s):
            xp = p._plus_impl(x, s * d)
            return p._eval_core(xp, False, False)["cost"]

        self._vg = eval_vg
        self._v = eval_v
        self.x = None
        self.d = None
        self.num_value_evals = 0
        self.num_gradient_evals = 0

    def init(self, x, d):
        self.x = x
        self.d = d

    def value(self, s: float) -> FunctionSample:
        self.num_value_evals += 1
        v = float(self._v(self.x, self.d, s))
        if not np.isfinite(v):
            return FunctionSample(x=s, value_is_valid=False)
        return FunctionSample.value_only(s, v)

    def value_and_gradient(self, s: float) -> FunctionSample:
        self.num_value_evals += 1
        self.num_gradient_evals += 1
        v, g = self._vg(self.x, self.d, s)
        v, g = float(v), float(g)
        if not (np.isfinite(v) and np.isfinite(g)):
            return FunctionSample(x=s, value_is_valid=False)
        return FunctionSample.with_gradient(s, v, g)


def _interpolate(
    interpolation: LineSearchInterpolationType,
    lo: FunctionSample,
    hi_x: float,
    samples: List[FunctionSample],
    lower: float,
    upper: float,
) -> float:
    if interpolation == LineSearchInterpolationType.BISECTION:
        # reference contraction rule min(max(0.5*current.x, min), max)
        # (line_search.cc:217-221)
        return float(np.clip(0.5 * hi_x, lower, upper))
    usable = [s for s in samples if s.value_is_valid]
    if interpolation == LineSearchInterpolationType.QUADRATIC:
        # Drop gradient info except at the first point (reference semantics).
        trimmed = []
        for i, s in enumerate(usable):
            t = FunctionSample(x=s.x, value=s.value, value_is_valid=True)
            if i == 0 and s.gradient_is_valid:
                t.gradient, t.gradient_is_valid = s.gradient, True
            trimmed.append(t)
        usable = trimmed
    if len(usable) < 2:
        return 0.5 * (lower + upper)
    x, _ = minimize_interpolating_polynomial(usable[-3:], lower, upper)
    if not np.isfinite(x) or not (lower <= x <= upper):
        return 0.5 * (lower + upper)
    return x


class ArmijoLineSearch:
    """Backtracking with interpolation (line_search.cc ArmijoLineSearch)."""

    def __init__(self, options: Options):
        self.o = options

    def search(self, fn: LineSearchFunction, step0: float, initial: FunctionSample):
        o = self.o
        current = fn.value_and_gradient(step0)
        previous = None
        descent = initial.gradient
        it = 0
        while (
            not current.value_is_valid
            or current.value
            > initial.value + o.line_search_sufficient_function_decrease * current.x * descent
        ):
            it += 1
            if it >= o.max_num_line_search_step_size_iterations:
                return None, it
            lower = o.max_line_search_step_contraction * current.x
            upper = o.min_line_search_step_contraction * current.x
            # reference window {lowerbound, current, previous-if-valid}
            # (line_search.cc:245-267) — NOT a trailing window of all probes
            window = [initial, current]
            if previous is not None and previous.value_is_valid:
                window.append(previous)
            new_x = _interpolate(
                o.line_search_interpolation_type, initial, current.x, window, lower, upper
            )
            if new_x < o.min_line_search_step_size:
                return None, it
            previous, current = current, fn.value_and_gradient(new_x)
        return current, it


class WolfeLineSearch:
    """Strong Wolfe: bracketing + zoom (line_search.cc WolfeLineSearch)."""

    def __init__(self, options: Options):
        self.o = options

    def search(self, fn: LineSearchFunction, step0: float, initial: FunctionSample):
        o = self.o
        c1 = o.line_search_sufficient_function_decrease
        c2 = o.line_search_sufficient_curvature_decrease
        phi0, dphi0 = initial.value, initial.gradient
        prev = initial
        current = fn.value_and_gradient(step0)
        evals = 1
        max_evals = o.max_num_line_search_step_size_iterations
        bracket_lo = bracket_hi = None
        while True:
            if not current.value_is_valid or (
                current.value > phi0 + c1 * current.x * dphi0
                or (prev is not initial and current.value >= prev.value)
            ):
                bracket_lo, bracket_hi = prev, current
                break
            if abs(current.gradient) <= c2 * abs(dphi0):
                return current, evals  # strong Wolfe satisfied
            if current.gradient >= 0:
                bracket_lo, bracket_hi = current, prev
                break
            if evals >= max_evals:
                return current if current.value_is_valid else None, evals
            new_x = current.x * o.max_line_search_step_expansion
            prev, current = current, fn.value_and_gradient(new_x)
            evals += 1

        # Zoom phase (Nocedal & Wright alg. 3.6 as in line_search.cc).
        lo, hi = bracket_lo, bracket_hi
        while evals < max_evals:
            lower, upper = min(lo.x, hi.x), max(lo.x, hi.x)
            if upper - lower < o.min_line_search_step_size:
                return (lo if lo.value_is_valid else None), evals
            new_x = _interpolate(
                o.line_search_interpolation_type,
                lo,
                max(lo.x, hi.x),
                [s for s in (lo, hi) if s.value_is_valid],
                lower + 0.01 * (upper - lower),
                upper - 0.01 * (upper - lower),
            )
            trial = fn.value_and_gradient(new_x)
            evals += 1
            if not trial.value_is_valid:
                hi = FunctionSample(x=new_x, value=np.inf, value_is_valid=True)
                continue
            if trial.value > phi0 + c1 * trial.x * dphi0 or trial.value >= lo.value:
                hi = trial
            else:
                if abs(trial.gradient) <= c2 * abs(dphi0):
                    return trial, evals
                if trial.gradient * (hi.x - lo.x) >= 0:
                    hi = lo
                lo = trial
        return (lo if lo.value_is_valid and lo.x > 0 else None), evals


class LowRankInverseHessian:
    """LBFGS two-loop recursion (low_rank_inverse_hessian.cc:62)."""

    def __init__(self, max_rank: int, use_approx_eigenvalue_scaling: bool):
        self.max_rank = max_rank
        self.use_approx = use_approx_eigenvalue_scaling
        self.s: List[np.ndarray] = []
        self.y: List[np.ndarray] = []
        self.rho: List[float] = []
        self.approx_eigenvalue_scale = 1.0

    def update(self, delta_x, delta_g):
        sy = float(np.dot(delta_x, delta_g))
        if sy <= 1e-10:
            return False
        if len(self.s) == self.max_rank:
            self.s.pop(0)
            self.y.pop(0)
            self.rho.pop(0)
        self.s.append(delta_x)
        self.y.append(delta_g)
        self.rho.append(1.0 / sy)
        self.approx_eigenvalue_scale = sy / float(np.dot(delta_g, delta_g))
        return True

    def right_multiply(self, g):
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(self.s), reversed(self.y), reversed(self.rho)):
            a = rho * np.dot(s, q)
            alphas.append(a)
            q -= a * y
        if self.use_approx or self.s:
            q *= self.approx_eigenvalue_scale
        for (s, y, rho), a in zip(
            zip(self.s, self.y, self.rho), reversed(alphas)
        ):
            b = rho * np.dot(y, q)
            q += (a - b) * s
        return q


class LineSearchMinimizer:
    """Outer loop (line_search_minimizer.cc:87)."""

    def __init__(self, program, options: Options, summary: Summary):
        self.program = program
        self.options = options
        self.summary = summary

        p = program

        @jax.jit
        def eval_full(x):
            o = p._eval_core(x, True, False)
            g = o["gradient"]
            return o["cost"], g, jnp.dot(g, g)

        @jax.jit
        def plus(x, d, s):
            return p._plus_impl(x, s * d)

        self._eval = eval_full
        self._plus = plus

    def minimize(self, x0):
        opts = self.options
        summary = self.summary
        start = time.monotonic()
        fn = LineSearchFunction(self.program)
        direction_type = opts.line_search_direction_type
        lbfgs = None
        bfgs_H = None
        if direction_type == LineSearchDirectionType.LBFGS:
            lbfgs = LowRankInverseHessian(
                opts.max_lbfgs_rank, opts.use_approximate_eigenvalue_bfgs_scaling
            )
        T = self.program.tangent_size
        if direction_type == LineSearchDirectionType.BFGS:
            bfgs_H = np.eye(T)
            bfgs_initialized = False

        x = x0
        cost, grad, gnorm2 = self._eval(x)
        cost = float(cost)
        grad_np = np.asarray(grad)
        summary.initial_cost = cost
        self.x_cost = cost
        prev_grad = None
        prev_direction = None
        prev_step = None
        search = (
            WolfeLineSearch(opts)
            if opts.line_search_type == LineSearchType.WOLFE
            else ArmijoLineSearch(opts)
        )
        num_restarts = 0
        it_num = 0
        iteration_start = start

        while True:
            gmax = float(np.max(np.abs(grad_np))) if grad_np.size else 0.0
            it = IterationSummary(
                iteration=it_num,
                cost=cost,
                gradient_norm=float(np.sqrt(float(gnorm2))),
                gradient_max_norm=gmax,
                step_is_valid=True,
                step_is_successful=True,
            )
            now = time.monotonic()
            it.iteration_time_in_seconds = now - iteration_start
            it.cumulative_time_in_seconds = now - start + summary.preprocessor_time_in_seconds
            it.line_search_function_evaluations = fn.num_value_evals
            summary.iterations.append(it)

            from ..callbacks import run_callbacks

            cb = run_callbacks(opts, it, summary, np.asarray(x))
            if cb is not None:
                summary.termination_type = cb
                break
            if gmax <= opts.gradient_tolerance:
                summary.message = (
                    f"Gradient tolerance reached. Gradient max norm: {gmax:e} <= "
                    f"{opts.gradient_tolerance:e}"
                )
                summary.termination_type = TerminationType.CONVERGENCE
                break
            if it_num >= opts.max_num_iterations:
                summary.message = (
                    f"Maximum number of iterations reached. Number of iterations: {it_num}."
                )
                summary.termination_type = TerminationType.NO_CONVERGENCE
                break
            if (time.monotonic() - start) >= opts.max_solver_time_in_seconds:
                summary.message = "Maximum solver time reached."
                summary.termination_type = TerminationType.NO_CONVERGENCE
                break

            iteration_start = time.monotonic()
            it_num += 1

            # ---- direction ------------------------------------------------
            if direction_type == LineSearchDirectionType.STEEPEST_DESCENT or prev_grad is None:
                direction = -grad_np
            elif direction_type == LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT:
                t = opts.nonlinear_conjugate_gradient_type
                gg = float(np.dot(prev_grad, prev_grad))
                if t == NonlinearConjugateGradientType.FLETCHER_REEVES:
                    beta = float(np.dot(grad_np, grad_np)) / gg
                elif t == NonlinearConjugateGradientType.POLAK_RIBIERE:
                    beta = float(np.dot(grad_np, grad_np - prev_grad)) / gg
                else:  # HESTENES_STIEFEL
                    dy = grad_np - prev_grad
                    beta = float(np.dot(grad_np, dy)) / max(
                        float(np.dot(prev_direction, dy)), 1e-300
                    )
                direction = -grad_np + max(beta, 0.0) * prev_direction
            elif direction_type == LineSearchDirectionType.LBFGS:
                direction = -lbfgs.right_multiply(grad_np.copy())
            else:  # BFGS
                direction = -(bfgs_H @ grad_np)

            descent = float(np.dot(direction, grad_np))
            if descent >= 0:
                num_restarts += 1
                if num_restarts > opts.max_num_line_search_direction_restarts:
                    summary.message = (
                        "Line search direction failure: exceeded "
                        "max_num_line_search_direction_restarts."
                    )
                    summary.termination_type = TerminationType.NO_CONVERGENCE
                    break
                direction = -grad_np
                descent = -float(gnorm2)

            # ---- initial step (line_search_minimizer.cc step size rules) --
            if it_num == 1:
                step0 = min(1.0, 1.0 / max(float(np.max(np.abs(grad_np))), 1e-300))
            elif prev_step is not None and descent != 0.0:
                step0 = min(1.0, 1.05 * prev_step * prev_descent / descent)
            else:
                step0 = 1.0
            step0 = max(step0, opts.min_line_search_step_size)

            fn.init(jnp.asarray(x), jnp.asarray(direction))
            initial = FunctionSample.with_gradient(0.0, cost, descent)
            result, evals = search.search(fn, step0, initial)
            summary.num_line_search_steps += evals
            if result is None:
                summary.message = (
                    "Numerical failure in line search: failed to find a valid step."
                )
                summary.termination_type = TerminationType.NO_CONVERGENCE
                break

            # ---- update ----------------------------------------------------
            new_x = self._plus(jnp.asarray(x), jnp.asarray(direction), result.x)
            new_cost, new_grad, new_gnorm2 = self._eval(new_x)
            new_cost = float(new_cost)
            new_grad_np = np.asarray(new_grad)

            delta_cost = cost - new_cost
            it_step_norm = float(np.linalg.norm(result.x * direction))
            if direction_type == LineSearchDirectionType.LBFGS:
                lbfgs.update(
                    result.x * direction, new_grad_np - grad_np
                )
            if direction_type == LineSearchDirectionType.BFGS:
                s_vec = result.x * direction
                y_vec = new_grad_np - grad_np
                sy = float(np.dot(s_vec, y_vec))
                if sy > 1e-10:
                    if not bfgs_initialized:
                        bfgs_H *= sy / max(float(np.dot(y_vec, y_vec)), 1e-300)
                        bfgs_initialized = True
                    rho = 1.0 / sy
                    V = np.eye(T) - rho * np.outer(s_vec, y_vec)
                    bfgs_H = V @ bfgs_H @ V.T + rho * np.outer(s_vec, s_vec)

            prev_grad = grad_np
            prev_direction = direction
            prev_step = result.x
            prev_descent = descent
            x, cost, grad_np, gnorm2 = new_x, new_cost, new_grad_np, new_gnorm2
            self.x_cost = cost
            summary.num_successful_steps += 1

            # function tolerance
            if abs(delta_cost) <= opts.function_tolerance * cost:
                summary.message = (
                    "Function tolerance reached. "
                    f"|cost_change|/cost: {abs(delta_cost) / max(cost, 1e-300):e} <= "
                    f"{opts.function_tolerance:e}"
                )
                summary.termination_type = TerminationType.CONVERGENCE
                # record final iteration state
                break
            # parameter tolerance
            x_norm = float(jnp.linalg.norm(x))
            if it_step_norm <= opts.parameter_tolerance * (
                x_norm + opts.parameter_tolerance
            ):
                summary.message = "Parameter tolerance reached."
                summary.termination_type = TerminationType.CONVERGENCE
                break

        self.x_cost = cost
        return x
