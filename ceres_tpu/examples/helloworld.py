"""Minimize 0.5 (10 - x)^2 (/root/reference/examples/helloworld.cc)."""
import numpy as np

import ceres_tpu as ct


def main():
    x = np.array([0.5])
    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(lambda x: 10.0 - x[0], 1, [1]), None, [x]
    )
    options = ct.Options(minimizer_progress_to_stdout=True)
    summary = ct.solve(options, problem)
    print(summary.brief_report())
    print(f"x : 0.5 -> {x[0]}")


if __name__ == "__main__":
    main()
