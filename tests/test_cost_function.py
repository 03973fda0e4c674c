"""Cost function tests: autodiff vs numeric diff (the reference's
numeric_diff_cost_function_test.cc / autodiff_cost_function_test.cc pattern)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import (
    AnalyticCostFunction,
    AutoDiffCostFunction,
    NormalPrior,
    NumericDiffCostFunction,
    cost_function_to_functor,
)


def _functor(a, b):
    return jnp.stack(
        [
            a[0] * b[0] + a[1] * jnp.sin(b[1]),
            jnp.exp(0.1 * a[2]) - b[0] * b[1],
        ]
    )


PARAMS = [jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([0.5, -0.7])]


def test_autodiff_jacobians_match_numeric_central():
    ad = AutoDiffCostFunction(_functor, 2, [3, 2])
    nd = NumericDiffCostFunction(_functor, 2, [3, 2], method="CENTRAL")
    r1, j1 = ad.residuals_and_jacobians(PARAMS)
    r2, j2 = nd.residuals_and_jacobians(PARAMS)
    np.testing.assert_allclose(r1, r2, atol=1e-14)
    for a, b in zip(j1, j2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_numeric_forward_less_accurate_than_central():
    ad = AutoDiffCostFunction(_functor, 2, [3, 2])
    fwd = NumericDiffCostFunction(_functor, 2, [3, 2], method="FORWARD")
    ctr = NumericDiffCostFunction(_functor, 2, [3, 2], method="CENTRAL")
    _, j_ad = ad.residuals_and_jacobians(PARAMS)
    _, j_f = fwd.residuals_and_jacobians(PARAMS)
    _, j_c = ctr.residuals_and_jacobians(PARAMS)
    err_f = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(j_ad, j_f))
    err_c = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(j_ad, j_c))
    assert err_c < err_f
    assert err_f < 1e-4


def test_ridders_high_accuracy():
    # Ridders should beat plain central difference on a stiff function
    # (numeric_diff_test pattern: exp(k x)).
    def stiff(x):
        return jnp.asarray([jnp.exp(5.0 * x[0])])

    ad = AutoDiffCostFunction(stiff, 1, [1])
    rid = NumericDiffCostFunction(stiff, 1, [1], method="RIDDERS")
    p = [jnp.asarray([1.0])]
    _, j_ad = ad.residuals_and_jacobians(p)
    _, j_r = rid.residuals_and_jacobians(p)
    np.testing.assert_allclose(j_r[0], j_ad[0], rtol=1e-9)


def test_analytic_cost_function():
    class MyCost(AnalyticCostFunction):
        num_residuals = 1
        parameter_block_sizes = (2,)

        def residuals(self, params, data=None):
            x = params[0]
            return jnp.asarray([x[0] * x[0] + 3.0 * x[1]])

        def jacobians(self, params, data=None):
            x = params[0]
            return [jnp.asarray([[2.0 * x[0], 3.0]])]

    c = MyCost()
    ad = AutoDiffCostFunction(
        lambda x: jnp.asarray([x[0] * x[0] + 3.0 * x[1]]), 1, [2]
    )
    p = [jnp.asarray([1.5, -2.0])]
    r1, j1 = c.residuals_and_jacobians(p)
    r2, j2 = ad.residuals_and_jacobians(p)
    np.testing.assert_allclose(r1, r2)
    np.testing.assert_allclose(j1[0], j2[0])


def test_normal_prior():
    A = np.asarray([[1.0, 0.5], [0.0, 2.0]])
    b = np.asarray([1.0, -1.0])
    prior = NormalPrior(A, b)
    x = jnp.asarray([2.0, 3.0])
    r = prior.residuals([x])
    np.testing.assert_allclose(r, A @ (np.asarray(x) - b))


def test_cost_function_to_functor_nesting():
    inner = AutoDiffCostFunction(lambda x: jnp.asarray([x[0] ** 2]), 1, [1])
    f = cost_function_to_functor(inner)
    outer = AutoDiffCostFunction(lambda x: 2.0 * f(x), 1, [1])
    r, (J,) = outer.residuals_and_jacobians([jnp.asarray([3.0])])
    np.testing.assert_allclose(r, [18.0])
    np.testing.assert_allclose(J, [[12.0]])


def test_data_argument():
    cost = AutoDiffCostFunction(lambda x, data: x - data, 2, [2])
    r = cost.residuals([jnp.asarray([3.0, 4.0])], jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(r, [2.0, 3.0])
