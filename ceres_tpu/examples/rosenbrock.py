"""Rosenbrock via GradientProblem with selectable derivative mode.

Covers /root/reference/examples/rosenbrock.cc (autodiff),
rosenbrock_analytic_diff.cc (hand-coded gradient) and
rosenbrock_numeric_diff.cc (central differences):
--diff {auto,analytic,numeric}.
"""
import argparse

import numpy as np

import ceres_tpu as ct
from ceres_tpu.gradient_problem import GradientProblem, solve_gradient_problem


def f(v):
    return (1.0 - v[0]) ** 2 + 100.0 * (v[1] - v[0] ** 2) ** 2


def analytic_grad(v):
    import jax.numpy as jnp

    return jnp.asarray([
        -2.0 * (1.0 - v[0]) - 400.0 * v[0] * (v[1] - v[0] ** 2),
        200.0 * (v[1] - v[0] ** 2),
    ])


def numeric_grad(v):
    import jax.numpy as jnp

    h = 1e-6
    e = jnp.eye(2)
    return jnp.asarray([
        (f(v + h * e[i]) - f(v - h * e[i])) / (2.0 * h) for i in range(2)
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff", choices=("auto", "analytic", "numeric"),
                    default="auto")
    args = ap.parse_args()
    x = np.array([-1.2, 1.0])
    grad = {"auto": None, "analytic": analytic_grad,
            "numeric": numeric_grad}[args.diff]
    problem = GradientProblem(f, 2, gradient=grad)
    options = ct.Options(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        line_search_direction_type=ct.LineSearchDirectionType.LBFGS,
        max_num_iterations=200,
        minimizer_progress_to_stdout=True,
    )
    summary = solve_gradient_problem(options, problem, x)
    print(summary.brief_report())
    print(f"Final x: {x} ({args.diff} derivatives)")


if __name__ == "__main__":
    main()
