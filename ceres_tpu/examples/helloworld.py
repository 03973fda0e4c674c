"""Minimize 0.5 (10 - x)^2 with each derivative mode.

Covers /root/reference/examples/helloworld.cc,
helloworld_analytic_diff.cc and helloworld_numeric_diff.cc:
--diff {auto,analytic,numeric} selects AutoDiffCostFunction,
AnalyticCostFunction, or NumericDiffCostFunction (CENTRAL).
"""
import argparse

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def make_cost(diff: str):
    if diff == "auto":
        return ct.AutoDiffCostFunction(lambda x: 10.0 - x[0], 1, [1])
    if diff == "numeric":
        return ct.NumericDiffCostFunction(
            lambda x: 10.0 - x[0], 1, [1], method="CENTRAL"
        )

    class QuadraticCost(ct.AnalyticCostFunction):
        num_residuals = 1
        parameter_block_sizes = (1,)

        def residuals(self, params, data=None):
            return jnp.asarray([10.0 - params[0][0]])

        def jacobians(self, params, data=None):
            return [jnp.asarray([[-1.0]])]

    return QuadraticCost()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff", choices=("auto", "analytic", "numeric"),
                    default="auto")
    args = ap.parse_args()
    x = np.array([0.5])
    problem = ct.Problem()
    problem.add_residual_block(make_cost(args.diff), None, [x])
    options = ct.Options(minimizer_progress_to_stdout=True)
    summary = ct.solve(options, problem)
    print(summary.brief_report())
    print(f"x : 0.5 -> {x[0]} ({args.diff} derivatives)")


if __name__ == "__main__":
    main()
