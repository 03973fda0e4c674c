"""Trust-region minimizer: the Levenberg–Marquardt outer loop.

TPU-native re-design of the reference's trust-region stack
(/root/reference/internal/ceres/trust_region_minimizer.cc:68-847,
levenberg_marquardt_strategy.cc:69-180, trust_region_step_evaluator.{h,cc},
trust_region_strategy.h:58). Control flow (accept/reject, tolerances,
radius updates) runs host-side on scalars; all array math is fused into a
handful of jitted kernels per compiled program ("symbolic once, numeric
many") so one LM iteration costs O(1) device round-trips instead of one per
vector op.

Semantics preserved from the reference:
 - Jacobi column scaling computed at iteration 0 (1/(1+||col||)), applied
   every iteration (trust_region_minimizer.cc:263-279);
 - LM regularization D = sqrt(clamp(diag(J'J))/radius)
   (levenberg_marquardt_strategy.cc:69-120);
 - model_cost_change = -(J step)'(r + J step/2); step invalid unless > 0;
 - non-monotonic step evaluation (Conn/Gould/Toint 10.1.2);
 - radius update: accept -> r /= max(1/3, 1-(2q-1)^3), reject -> r /= k,
   k doubling;
 - bounds via projection inside Plus + projected gradient norms + projected
   Armijo line search along the step;
 - termination taxonomy and message strings.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..options import Options
from ..summary import IterationSummary, Summary
from ..types import (
    CallbackReturnType,
    LinearSolverTerminationType,
    TerminationType,
)

_DBL_MAX = float(np.finfo(np.float64).max)


class TrustRegionStepEvaluator:
    """Non-monotonic step acceptance (trust_region_step_evaluator.{h,cc})."""

    def __init__(self, initial_cost: float, max_consecutive_nonmonotonic_steps: int):
        self.max_steps = max_consecutive_nonmonotonic_steps
        self.minimum_cost = initial_cost
        self.current_cost = initial_cost
        self.reference_cost = initial_cost
        self.candidate_cost = initial_cost
        self.acc_reference_model_cost_change = 0.0
        self.acc_candidate_model_cost_change = 0.0
        self.num_consecutive_nonmonotonic_steps = 0

    def step_quality(self, cost: float, model_cost_change: float) -> float:
        if cost >= _DBL_MAX:
            return -_DBL_MAX
        relative_decrease = (self.current_cost - cost) / model_cost_change
        historical = (self.reference_cost - cost) / (
            self.acc_reference_model_cost_change + model_cost_change
        )
        return max(relative_decrease, historical)

    def step_accepted(self, cost: float, model_cost_change: float):
        self.current_cost = cost
        self.acc_candidate_model_cost_change += model_cost_change
        self.acc_reference_model_cost_change += model_cost_change
        if self.current_cost < self.minimum_cost:
            self.minimum_cost = self.current_cost
            self.num_consecutive_nonmonotonic_steps = 0
            self.candidate_cost = self.current_cost
            self.acc_candidate_model_cost_change = 0.0
        else:
            self.num_consecutive_nonmonotonic_steps += 1
            if self.current_cost > self.candidate_cost:
                self.candidate_cost = self.current_cost
                self.acc_candidate_model_cost_change = 0.0
        if self.num_consecutive_nonmonotonic_steps == self.max_steps:
            self.reference_cost = self.candidate_cost
            self.acc_reference_model_cost_change = self.acc_candidate_model_cost_change


import dataclasses


@dataclasses.dataclass
class StepResult:
    delta: object = None
    model_cost_change: float = 0.0
    termination: LinearSolverTerminationType = LinearSolverTerminationType.SUCCESS
    num_iterations: int = 1


class LevenbergMarquardtStrategy:
    """LM regularization + radius bookkeeping
    (levenberg_marquardt_strategy.cc:69-180)."""

    def __init__(self, options: Options):
        self.radius = options.initial_trust_region_radius
        self.max_radius = options.max_trust_region_radius
        self.min_diagonal = options.min_lm_diagonal
        self.max_diagonal = options.max_lm_diagonal
        self.decrease_factor = 2.0
        self.reuse_diagonal = False
        self._diagonal = None

    def compute_step(self, m: "TrustRegionMinimizer") -> StepResult:
        scale = getattr(m, "effective_scale", m.scale)
        if not self.reuse_diagonal or self._diagonal is None:
            self._diagonal = m.k.lm_diagonal(m.jacobian, scale)
        self.reuse_diagonal = True
        step, delta, mcc, num_iters = m.k.compute_step(
            m.jacobian, m.residuals, scale, self._diagonal, self.radius
        )
        finite = bool(jnp.all(jnp.isfinite(step)))
        if not finite:
            return StepResult(termination=LinearSolverTerminationType.FAILURE)
        return StepResult(
            delta=delta,
            model_cost_change=float(mcc),
            termination=LinearSolverTerminationType.SUCCESS,
            num_iterations=int(num_iters),
        )

    def step_accepted(self, step_quality: float):
        assert step_quality > 0.0
        self.radius = self.radius / max(1.0 / 3.0, 1.0 - (2.0 * step_quality - 1.0) ** 3)
        self.radius = min(self.max_radius, self.radius)
        self.decrease_factor = 2.0
        self.reuse_diagonal = False

    def step_rejected(self, step_quality: float):
        self.radius = self.radius / self.decrease_factor
        self.decrease_factor *= 2.0
        self.reuse_diagonal = True

    def step_is_invalid(self):
        self.step_rejected(0.0)


class DenseTrustRegionKernels:
    """Fused jitted kernels for the dense-Jacobian path.

    The sparse/Schur paths provide the same four entry points over their own
    Jacobian representation (see solvers/linear/*)."""

    def __init__(self, program, linear_solver, options: Options):
        self.program = program
        self.options = options
        self.linear_solver = linear_solver
        prog = program

        @jax.jit
        def eval_full(x):
            o = prog._eval_core(x, True, True)
            cost, residuals, gradient, J = (
                o["cost"],
                o["residuals"],
                o["gradient"],
                o["jacobian"],
            )
            pg = prog._plus_impl(x, -gradient)
            dx = x - pg
            return (
                cost,
                residuals,
                gradient,
                J,
                jnp.linalg.norm(dx),
                jnp.max(jnp.abs(dx)) if dx.shape[0] else jnp.asarray(0.0),
            )

        @jax.jit
        def jacobi_scale(J):
            # scale = 1/(1+sqrt(diag(J'J))) (trust_region_minimizer.cc:272)
            return 1.0 / (1.0 + jnp.sqrt(jnp.sum(J * J, axis=0)))

        min_d, max_d = options.min_lm_diagonal, options.max_lm_diagonal

        @jax.jit
        def lm_diagonal(J, scale):
            Js = J * scale[None, :]
            return jnp.clip(jnp.sum(Js * Js, axis=0), min_d, max_d)

        solve = linear_solver

        @jax.jit
        def compute_step(J, residuals, scale, diagonal, radius):
            Js = J * scale[None, :]
            D = jnp.sqrt(diagonal / radius)
            y = solve(Js, residuals, D)
            step = -y
            model_residuals = Js @ step
            model_cost_change = -jnp.dot(
                model_residuals, residuals + model_residuals / 2.0
            )
            delta = step * scale
            return step, delta, model_cost_change, jnp.asarray(1, jnp.int32)

        @jax.jit
        def candidate(x, delta):
            cx = prog._plus_impl(x, delta)
            o = prog._eval_core(cx, False, False)
            return cx, o["cost"], jnp.linalg.norm(x - cx)

        @jax.jit
        def cost_at(x, delta):
            cx = prog._plus_impl(x, delta)
            return prog._eval_core(cx, False, False)["cost"]

        self.eval_full = eval_full
        self.jacobi_scale = jacobi_scale
        self.lm_diagonal = lm_diagonal
        self.compute_step = compute_step
        self.candidate = candidate
        self.cost_at = cost_at


class TrustRegionMinimizer:
    """Host-side outer loop mirroring trust_region_minimizer.cc:68-160."""

    def __init__(self, program, kernels, options: Options, summary: Summary,
                 inner_minimizer=None):
        self.program = program
        self.k = kernels
        self.options = options
        self.summary = summary
        self.inner_minimizer = inner_minimizer

    # -- helpers ------------------------------------------------------------

    def _notify(self, it_summary: IterationSummary) -> Optional[TerminationType]:
        from ..callbacks import run_callbacks

        return run_callbacks(self.options, it_summary, self.summary, self._x_np())

    def _x_np(self):
        return np.asarray(self.x)

    # -- main ---------------------------------------------------------------

    def minimize(self, x0):
        opts = self.options
        summary = self.summary
        start = time.monotonic()
        self.x = x0
        self.x_cost = float("nan")  # defined even if iteration zero fails
        strategy = LevenbergMarquardtStrategy(opts)
        if opts.trust_region_strategy_type.name == "DOGLEG":
            from .dogleg import DoglegStrategy

            strategy = DoglegStrategy(opts, self.k)
        self._strategy = strategy
        is_constrained = self.program.has_bounds()
        self._tangent_box = self.program.tangent_box() if is_constrained else None
        inner_enabled = self.inner_minimizer is not None
        inner_were_useful = False

        it = IterationSummary(iteration=0, step_is_valid=False, eta=opts.eta)
        iteration_start = start

        # Iteration zero: project x onto feasible set, evaluate.
        if is_constrained:
            self.x = self.k.candidate(self.x, jnp.zeros(self.program.tangent_size))[0]
        ev0 = self._evaluate_gradient_and_jacobian(first=True)
        if ev0 is None:
            summary.message = "Initial residual and Jacobian evaluation failed."
            summary.termination_type = TerminationType.FAILURE
            return self.x
        it.cost = self.x_cost  # evaluator cost already includes fixed_cost
        it.gradient_norm = self.gradient_norm
        it.gradient_max_norm = self.gradient_max_norm
        it.step_is_valid = True
        it.step_is_successful = True
        summary.initial_cost = self.x_cost
        step_evaluator = TrustRegionStepEvaluator(
            self.x_cost,
            opts.max_consecutive_nonmonotonic_steps if opts.use_nonmonotonic_steps else 0,
        )
        num_consecutive_invalid_steps = 0
        minimum_cost = self.x_cost
        best_x = self.x
        atleast_one_successful_step = False

        while True:
            # FinalizeIterationAndCheckIfMinimizerCanContinue
            if it.step_is_successful:
                summary.num_successful_steps += 1
                if self.x_cost < minimum_cost:
                    minimum_cost = self.x_cost
                    best_x = self.x
                    it.step_is_nonmonotonic = False
                else:
                    it.step_is_nonmonotonic = True
            else:
                summary.num_unsuccessful_steps += 1
            it.trust_region_radius = strategy.radius
            now = time.monotonic()
            it.iteration_time_in_seconds = now - iteration_start
            it.cumulative_time_in_seconds = (
                now - start
            ) + summary.preprocessor_time_in_seconds
            summary.iterations.append(it)

            cb = self._notify(it)
            if cb is not None:
                summary.termination_type = cb
                break
            total_time = (time.monotonic() - start) + summary.preprocessor_time_in_seconds
            if total_time >= opts.max_solver_time_in_seconds:
                summary.message = (
                    f"Maximum solver time reached. Total solver time: {total_time:e} >= "
                    f"{opts.max_solver_time_in_seconds:e}."
                )
                summary.termination_type = TerminationType.NO_CONVERGENCE
                break
            if it.iteration >= opts.max_num_iterations:
                summary.message = (
                    f"Maximum number of iterations reached. Number of iterations: {it.iteration}."
                )
                summary.termination_type = TerminationType.NO_CONVERGENCE
                break
            if it.step_is_successful and it.gradient_max_norm <= opts.gradient_tolerance:
                summary.message = (
                    f"Gradient tolerance reached. Gradient max norm: "
                    f"{it.gradient_max_norm:e} <= {opts.gradient_tolerance:e}"
                )
                summary.termination_type = TerminationType.CONVERGENCE
                break
            if it.trust_region_radius <= opts.min_trust_region_radius:
                summary.message = (
                    f"Minimum trust region radius reached. Trust region radius: "
                    f"{it.trust_region_radius:e} <= {opts.min_trust_region_radius:e}"
                )
                summary.termination_type = TerminationType.CONVERGENCE
                break

            iteration_start = time.monotonic()
            prev_gradient_norm = it.gradient_norm
            prev_gradient_max_norm = it.gradient_max_norm
            prev_it = it
            it = IterationSummary(
                iteration=prev_it.iteration + 1, eta=opts.eta, step_is_valid=False
            )

            # --- ComputeTrustRegionStep -----------------------------------
            solver_start = time.monotonic()
            step_result = strategy.compute_step(self)
            it.step_solver_time_in_seconds = time.monotonic() - solver_start
            summary.linear_solver_time_in_seconds += it.step_solver_time_in_seconds
            summary.num_linear_solves += 1
            if step_result.termination == LinearSolverTerminationType.FATAL_ERROR:
                summary.message = (
                    "Linear solver failed due to unrecoverable non-numeric causes."
                )
                summary.termination_type = TerminationType.FAILURE
                break
            it.linear_solver_iterations = step_result.num_iterations
            if it.iteration in opts.trust_region_minimizer_iterations_to_dump:
                self._dump_iteration(it.iteration, strategy, step_result)
            if step_result.termination != LinearSolverTerminationType.FAILURE:
                model_cost_change = float(step_result.model_cost_change)
                it.step_is_valid = model_cost_change > 0.0
            if it.step_is_valid:
                delta = step_result.delta
                model_cost_change = float(step_result.model_cost_change)
                num_consecutive_invalid_steps = 0

            if not it.step_is_valid:
                # HandleInvalidStep
                num_consecutive_invalid_steps += 1
                if num_consecutive_invalid_steps >= opts.max_num_consecutive_invalid_steps:
                    summary.message = (
                        "Number of consecutive invalid steps more than "
                        "Solver::Options::max_num_consecutive_invalid_steps: "
                        f"{opts.max_num_consecutive_invalid_steps}"
                    )
                    summary.termination_type = TerminationType.FAILURE
                    break
                strategy.step_is_invalid()
                it.cost = self.x_cost  # evaluator cost already includes fixed_cost
                it.cost_change = 0.0
                it.gradient_max_norm = prev_gradient_max_norm
                it.gradient_norm = prev_gradient_norm
                it.step_norm = 0.0
                it.relative_decrease = 0.0
                it.step_is_successful = False
                continue

            # --- projected line search for bounds -------------------------
            if is_constrained and opts.max_num_line_search_step_size_iterations > 0:
                delta = self._projected_line_search(delta)

            # --- candidate point ------------------------------------------
            cand_x, cand_cost, step_norm = self.k.candidate(self.x, delta)
            candidate_cost = float(cand_cost)
            if not np.isfinite(candidate_cost):
                candidate_cost = _DBL_MAX
            it.step_norm = float(step_norm)

            # --- inner iterations (coordinate descent) --------------------
            inner_were_useful = False
            if inner_enabled and candidate_cost < _DBL_MAX:
                t0 = time.monotonic()
                summary.num_inner_iteration_steps += 1
                new_x = self.inner_minimizer.minimize(cand_x)
                inner_cost = float(self.k.cost_at(new_x, jnp.zeros_like(delta)))
                if np.isfinite(inner_cost):
                    inner_cost_change = candidate_cost - inner_cost
                    model_cost_change += inner_cost_change
                    inner_were_useful = inner_cost < min(self.x_cost, candidate_cost)
                    rel_progress = 1.0 - inner_cost / candidate_cost
                    inner_enabled = rel_progress > opts.inner_iteration_tolerance
                    cand_x = new_x
                    candidate_cost = inner_cost
                summary.inner_iteration_time_in_seconds += time.monotonic() - t0

            # --- convergence checks ---------------------------------------
            x_norm = float(jnp.linalg.norm(self.x))
            if atleast_one_successful_step:
                step_size_tolerance = opts.parameter_tolerance * (
                    x_norm + opts.parameter_tolerance
                )
                if it.step_norm <= step_size_tolerance:
                    summary.message = (
                        "Parameter tolerance reached. Relative step_norm: "
                        f"{it.step_norm / (x_norm + opts.parameter_tolerance):e} <= "
                        f"{opts.parameter_tolerance:e}."
                    )
                    summary.termination_type = TerminationType.CONVERGENCE
                    summary.iterations.append(it)
                    break
            it.cost_change = self.x_cost - candidate_cost
            if abs(it.cost_change) <= opts.function_tolerance * self.x_cost:
                summary.message = (
                    "Function tolerance reached. |cost_change|/cost: "
                    f"{abs(it.cost_change) / self.x_cost:e} <= {opts.function_tolerance:e}"
                )
                summary.termination_type = TerminationType.CONVERGENCE
                summary.iterations.append(it)
                break

            # --- accept / reject ------------------------------------------
            it.relative_decrease = step_evaluator.step_quality(
                candidate_cost, model_cost_change
            )
            successful = (
                inner_were_useful or it.relative_decrease > opts.min_relative_decrease
            )
            if successful:
                atleast_one_successful_step = True
                self.x = cand_x
                self.x_cost = candidate_cost
                if self._evaluate_gradient_and_jacobian(first=False) is None:
                    summary.message = "Residual and Jacobian evaluation failed."
                    summary.termination_type = TerminationType.FAILURE
                    break
                it.cost = self.x_cost  # evaluator cost already includes fixed_cost
                it.gradient_norm = self.gradient_norm
                it.gradient_max_norm = self.gradient_max_norm
                it.step_is_successful = True
                strategy.step_accepted(it.relative_decrease)
                step_evaluator.step_accepted(candidate_cost, model_cost_change)
            else:
                it.step_is_successful = False
                it.cost = candidate_cost
                it.gradient_norm = prev_gradient_norm
                it.gradient_max_norm = prev_gradient_max_norm
                strategy.step_rejected(it.relative_decrease)

        # Return the best point seen (matches reference: x_ holds the
        # parameters of the minimum cost over all iterations).
        if self.x_cost > minimum_cost:
            self.x = best_x
            self.x_cost = minimum_cost
        return self.x

    # ------------------------------------------------------------------

    def _dump_iteration(self, iteration, strategy, step_result):
        """trust_region_minimizer_iterations_to_dump support
        (trust_region_minimizer.cc:387-395)."""
        import os

        from ..utils.dump import dump_linear_least_squares_problem

        base = os.path.join(
            self.options.trust_region_problem_dump_directory,
            f"ceres_tpu_iteration_{iteration:03d}",
        )
        if hasattr(self.k, "meta"):
            from ..ops import bsr

            J = np.asarray(bsr.to_dense(self.k.meta, self.jacobian))
        else:
            J = np.asarray(self.jacobian)
        D = None
        if getattr(strategy, "_diagonal", None) is not None:
            D = np.sqrt(np.asarray(strategy._diagonal) / strategy.radius)
        x = None if step_result.delta is None else np.asarray(step_result.delta)
        dump_linear_least_squares_problem(
            base, J, D=D, b=np.asarray(self.residuals), x=x
        )

    def _evaluate_gradient_and_jacobian(self, first: bool):
        opts = self.options
        t0 = time.monotonic()
        if opts.evaluation_callback is not None:
            opts.evaluation_callback.prepare_for_evaluation(
                evaluate_jacobians=True, new_evaluation_point=True
            )
        cost, residuals, gradient, J, gnorm, gmax = self.k.eval_full(self.x)
        self.summary.jacobian_evaluation_time_in_seconds += time.monotonic() - t0
        self.summary.num_jacobian_evaluations += 1
        cost_f = float(cost)
        if not np.isfinite(cost_f):
            return None
        self.x_cost = cost_f
        self.residuals = residuals
        self.gradient = gradient
        self.jacobian = J
        if opts.jacobi_scaling:
            if first:
                self.scale = self.k.jacobi_scale(J)
        else:
            if first:
                self.scale = jnp.ones(self.program.tangent_size)
        self.gradient_norm = float(gnorm)
        self.gradient_max_norm = float(gmax)
        self._update_effective_scale()
        return True

    def _update_effective_scale(self):
        """Active-set restriction for bounds: zero the Jacobian columns of
        coordinates sitting on a bound with the gradient pushing outward,
        so the trust-region subproblem is solved in the free subspace
        (gradient-projection flavor; improves on the pure clip-projection,
        whose step quality the reference itself flags as weak —
        trust_region_minimizer.cc:592 TODO / upstream issue 187). The mask
        is recomputed from (x, gradient) after every accepted step."""
        self.effective_scale = self.scale
        box = getattr(self, "_tangent_box", None)
        if box is None:
            return
        tmap, lo, hi = box
        xs = np.asarray(self.x)
        xv = np.where(tmap >= 0, xs[np.maximum(tmap, 0)], 0.0)
        g = np.asarray(self.gradient)
        active = (tmap >= 0) & (
            ((xv <= lo) & (g > 0.0)) | ((xv >= hi) & (g < 0.0))
        )
        if active.any():
            self.effective_scale = self.scale * jnp.asarray(
                np.where(active, 0.0, 1.0)
            )

    def _projected_line_search(self, delta):
        """Armijo backtracking on the step scale with bound projection
        (trust_region_minimizer.cc:591-645; simple contraction variant)."""
        opts = self.options
        cost0 = self.x_cost
        slope = float(jnp.dot(self.gradient, delta))
        step = 1.0
        best_step, best_cost = None, cost0
        for _ in range(opts.max_num_line_search_step_size_iterations):
            c = float(self.k.cost_at(self.x, step * delta))
            if np.isfinite(c) and c <= cost0 + opts.line_search_sufficient_function_decrease * step * slope:
                best_step, best_cost = step, c
                break
            if np.isfinite(c) and c < best_cost:
                best_step, best_cost = step, c
            step *= 0.5
            if step < opts.min_line_search_step_size:
                break
        if best_step is None:
            return delta
        return best_step * delta
