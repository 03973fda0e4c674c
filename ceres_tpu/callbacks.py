"""Iteration callbacks + per-iteration logging.

Mirrors /root/reference/include/ceres/iteration_callback.h:194 and
/root/reference/internal/ceres/callbacks.{h,cc}:45-75 (StateUpdatingCallback,
LoggingCallback; update_state_every_iteration contract solver.h:786-815).
"""
from __future__ import annotations

from typing import Optional

from .summary import IterationSummary, Summary
from .types import CallbackReturnType, LoggingType, MinimizerType, TerminationType


class IterationCallback:
    """Subclass and override __call__(iteration_summary) -> CallbackReturnType."""

    def __call__(self, summary: IterationSummary) -> CallbackReturnType:
        raise NotImplementedError


class EvaluationCallback:
    """User hook run before each residual/Jacobian evaluation
    (evaluation_callback.h:63; wired as in program_evaluator.h:155-160).
    Attach via Options.evaluation_callback."""

    def prepare_for_evaluation(self, evaluate_jacobians: bool,
                               new_evaluation_point: bool) -> None:
        raise NotImplementedError


def trust_region_log_line(s: IterationSummary) -> str:
    """LoggingCallback's trust-region format (callbacks.cc)."""
    return (
        f"iter {s.iteration:4d}  cost {s.cost: .8e}  cost_change {s.cost_change: .2e}  "
        f"|gradient| {s.gradient_max_norm: .2e}  |step| {s.step_norm: .2e}  "
        f"tr_ratio {s.relative_decrease: .2e}  tr_radius {s.trust_region_radius: .2e}  "
        f"ls_iter {s.linear_solver_iterations:3d}  iter_time {s.iteration_time_in_seconds: .2e}  "
        f"total_time {s.cumulative_time_in_seconds: .2e}"
    )


def line_search_log_line(s: IterationSummary) -> str:
    return (
        f"iter {s.iteration:4d}  cost {s.cost: .8e}  cost_change {s.cost_change: .2e}  "
        f"|gradient| {s.gradient_max_norm: .2e}  |step| {s.step_norm: .2e}  "
        f"f_evals {s.line_search_function_evaluations:3d}  "
        f"g_evals {s.line_search_gradient_evaluations:3d}  "
        f"iter_time {s.iteration_time_in_seconds: .2e}  "
        f"total_time {s.cumulative_time_in_seconds: .2e}"
    )


def run_callbacks(options, it_summary: IterationSummary, summary: Summary, x_np) -> Optional[TerminationType]:
    """Run logging + state update + user callbacks; returns a termination type
    if a callback aborts/terminates, else None (minimizer.cc RunCallbacks)."""
    if (
        options.logging_type == LoggingType.PER_MINIMIZER_ITERATION
        and options.minimizer_progress_to_stdout
    ):
        if options.minimizer_type == MinimizerType.LINE_SEARCH:
            print(line_search_log_line(it_summary))
        else:
            print(trust_region_log_line(it_summary))
    if options.update_state_every_iteration and getattr(options, "_program", None) is not None:
        options._program.write_state(x_np)
    prog = getattr(options, "_program", None)
    for cb in options.callbacks:
        ret = cb(it_summary)
        if (
            prog is not None
            and getattr(prog, "problem", None) is not None
            and prog.problem.structure_version != prog.structure_version
        ):
            # the reference leaves mid-solve mutation undefined
            # (problem.h: "may not modify the problem while Solve is
            # running"); fail loudly instead of solving a stale structure
            raise RuntimeError(
                "Problem structure was modified during Solve() (inside an "
                "IterationCallback). Mutating the problem mid-solve is not "
                "supported: return SOLVER_TERMINATE_SUCCESSFULLY from the "
                "callback, mutate, and call solve() again (the compiled "
                "program is cached and rebuilt only on structural change)."
            )
        if ret == CallbackReturnType.SOLVER_ABORT:
            summary.message = "User callback returned SOLVER_ABORT."
            return TerminationType.USER_FAILURE
        if ret == CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY:
            summary.message = "User callback returned SOLVER_TERMINATE_SUCCESSFULLY."
            return TerminationType.USER_SUCCESS
    return None
