"""Cost function over sampled data via cubic interpolation
(/root/reference/examples/sampled_function/sampled_function.cc)."""
import numpy as np

import ceres_tpu as ct


def main():
    import jax.numpy as jnp

    # f(x) = (x - 4.5)^2 sampled on a grid
    xs = np.arange(10.0)
    values = (xs - 4.5) ** 2
    interp = ct.CubicInterpolator(ct.Grid1D(values))

    x = np.array([1.0])
    problem = ct.Problem()
    problem.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.atleast_1d(interp(v[0])), 1, [1]),
        None,
        [x],
    )
    summary = ct.solve(ct.Options(max_num_iterations=50), problem)
    print(summary.brief_report())
    print(f"Expected x: 4.5, actual x: {x[0]:.6f}")


if __name__ == "__main__":
    main()
