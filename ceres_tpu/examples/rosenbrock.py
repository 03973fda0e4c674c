"""Rosenbrock via GradientProblem (/root/reference/examples/rosenbrock.cc
and rosenbrock_analytic_diff.cc — here the gradient is reverse-mode AD)."""
import numpy as np

import ceres_tpu as ct
from ceres_tpu.gradient_problem import GradientProblem, solve_gradient_problem


def main():
    def f(v):
        return (1.0 - v[0]) ** 2 + 100.0 * (v[1] - v[0] ** 2) ** 2

    x = np.array([-1.2, 1.0])
    problem = GradientProblem(f, 2)
    options = ct.Options(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        line_search_direction_type=ct.LineSearchDirectionType.LBFGS,
        max_num_iterations=200,
        minimizer_progress_to_stdout=True,
    )
    summary = solve_gradient_problem(options, problem, x)
    print(summary.brief_report())
    print(f"Final x: {x}")


if __name__ == "__main__":
    main()
