"""EvaluationCallback + externally supplied Jacobians
(/root/reference/examples/evaluation_callback_example.cc): the callback
is notified before every residual/Jacobian evaluation — the hook for
preparing shared computation outside the solver — and the cost function
supplies CLOSED-FORM Jacobians (AnalyticCostFunction) instead of
autodiff. Results must be identical to curve_fitting.py.

On TPU the batched evaluation is already one fused vectorized pass, so
the per-observation "copy out of a shared buffer" trick the reference
uses to get vectorization is unnecessary; what remains meaningful (and
is exercised here) is the callback CONTRACT — evaluate_jacobians /
new_evaluation_point notifications in evaluation order.
"""
import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def generate_data(m=0.3, c=0.1, n=67, noise=0.2, seed=23497):
    rng = np.random.RandomState(seed)
    x = np.arange(n) * 0.075
    y = np.exp(m * x + c) + noise * rng.randn(n)
    return x, y


class ExponentialCost(ct.AnalyticCostFunction):
    """r = y - exp(m x + c) with hand-written Jacobian
    (SizedCostFunction analog)."""

    num_residuals = 1
    parameter_block_sizes = (2,)

    def residuals(self, params, data=None):
        (mc,) = params
        x, y = data
        return (y - jnp.exp(mc[0] * x + mc[1])).reshape(1)

    def jacobians(self, params, data=None):
        (mc,) = params
        x, _ = data
        e = jnp.exp(mc[0] * x + mc[1])
        return [jnp.stack([-x * e, -e]).reshape(1, 2)]


class CountingCallback(ct.EvaluationCallback):
    """Tracks the evaluation-point protocol (evaluation_callback.h:63):
    new_evaluation_point=True exactly when the solver moved x since the
    previous prepare call."""

    def __init__(self):
        self.calls = 0
        self.new_points = 0

    def prepare_for_evaluation(self, evaluate_jacobians, new_evaluation_point):
        self.calls += 1
        if new_evaluation_point:
            self.new_points += 1


def main():
    xs, ys = generate_data()

    cb = CountingCallback()
    mc = np.array([0.0, 0.0])
    problem = ct.Problem()
    cost = ExponentialCost()
    for x, y in zip(xs, ys):
        problem.add_residual_block(
            cost, None, [mc], data=(np.float64(x), np.float64(y)))
    opts = ct.Options(max_num_iterations=50, evaluation_callback=cb)
    s = ct.solve(opts, problem)
    print(s.brief_report())
    print(f"analytic-Jacobian fit: m = {mc[0]:.6f}, c = {mc[1]:.6f}")
    print(f"callback: {cb.calls} prepare calls, {cb.new_points} new points")

    # must match the autodiff version (curve_fitting.py) exactly
    mc2 = np.array([0.0, 0.0])
    problem2 = ct.Problem()
    auto = ct.AutoDiffCostFunction(
        lambda p, data: (data[1] - jnp.exp(p[0] * data[0] + p[1])).reshape(1),
        1, [2])
    for x, y in zip(xs, ys):
        problem2.add_residual_block(
            auto, None, [mc2], data=(np.float64(x), np.float64(y)))
    s2 = ct.solve(ct.Options(max_num_iterations=50), problem2)
    print(f"autodiff fit:          m = {mc2[0]:.6f}, c = {mc2[1]:.6f}")
    assert abs(mc[0] - mc2[0]) < 1e-8 and abs(mc[1] - mc2[1]) < 1e-8
    assert cb.calls > 0 and cb.new_points > 0
    print("identical results — OK")


if __name__ == "__main__":
    main()
