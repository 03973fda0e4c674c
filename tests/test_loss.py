"""Loss function tests: value/derivative consistency (reference
loss_function_test.cc pattern — finite-difference checks of rho' and rho'')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import (
    ArctanLoss,
    CauchyLoss,
    ComposedLoss,
    HuberLoss,
    ScaledLoss,
    SoftLOneLoss,
    TolerantLoss,
    TrivialLoss,
    TukeyLoss,
)
from ceres_tpu.loss import correct_residuals_and_jacobians

LOSSES = [
    TrivialLoss(),
    HuberLoss(0.7),
    SoftLOneLoss(0.7),
    CauchyLoss(1.3),
    ArctanLoss(1.3),
    TolerantLoss(0.7, 0.4),
    TukeyLoss(2.0),
    ScaledLoss(CauchyLoss(1.0), 3.0),
    # Note: parameters chosen so no test point lands exactly on Huber's kink.
    ComposedLoss(HuberLoss(1.1), SoftLOneLoss(0.5)),
]


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
@pytest.mark.parametrize("s", [0.1, 0.5, 1.0, 2.0, 5.0])
def test_derivative_consistency(loss, s):
    s = jnp.asarray(s)
    rho0, rho1, rho2 = loss.evaluate(s)
    eps = 1e-6
    r0p = loss.evaluate(s + eps)[0]
    r0m = loss.evaluate(s - eps)[0]
    fd1 = (r0p - r0m) / (2 * eps)
    np.testing.assert_allclose(rho1, fd1, rtol=1e-4, atol=1e-7)
    r1p = loss.evaluate(s + eps)[1]
    r1m = loss.evaluate(s - eps)[1]
    fd2 = (r1p - r1m) / (2 * eps)
    np.testing.assert_allclose(rho2, fd2, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
def test_zero_and_monotone(loss):
    # rho(0) == 0 and rho is non-decreasing.
    rho0_at_0 = float(loss.evaluate(jnp.asarray(0.0))[0])
    assert abs(rho0_at_0) < 1e-12
    ss = jnp.linspace(0.0, 10.0, 101)
    r = loss.evaluate(ss)[0]
    assert bool(jnp.all(jnp.diff(r) >= -1e-12))


def test_huber_matches_reference_values():
    # Quadratic region: rho = s; linear region: rho = 2a sqrt(s) - a^2.
    a = 1.5
    loss = HuberLoss(a)
    s_in = jnp.asarray(1.0)
    r = loss.evaluate(s_in)
    np.testing.assert_allclose(r[0], 1.0)
    np.testing.assert_allclose(r[1], 1.0)
    s_out = jnp.asarray(9.0)
    r = loss.evaluate(s_out)
    np.testing.assert_allclose(r[0], 2 * a * 3.0 - a * a)
    np.testing.assert_allclose(r[1], a / 3.0)


def test_corrector_matches_explicit_robustified_gauss_newton():
    """The corrected (r, J) must satisfy: J_c^T r_c == rho' J^T r (gradient of
    0.5*rho(||r||^2)) — the defining property used by corrector_test.cc."""
    rng = np.random.default_rng(42)
    B, m, n = 5, 3, 4
    res = jnp.asarray(rng.standard_normal((B, m)))
    J = jnp.asarray(rng.standard_normal((B, m, n)))
    loss = CauchyLoss(0.8)
    cost_b, res_c, (J_c,) = correct_residuals_and_jacobians(loss, res, [J])
    sq = jnp.sum(res * res, axis=-1)
    rho0, rho1, rho2 = loss.evaluate(sq)
    np.testing.assert_allclose(cost_b, 0.5 * rho0)
    grad_c = jnp.einsum("brn,br->bn", J_c, res_c)
    grad_expected = rho1[:, None] * jnp.einsum("brn,br->bn", J, res)
    np.testing.assert_allclose(grad_c, grad_expected, rtol=1e-10)


def test_corrector_outlier_region_first_order_only():
    # Tukey beyond a: rho' = 0 -> corrected residual/jacobian are zero.
    loss = TukeyLoss(1.0)
    res = jnp.asarray([[5.0, 0.0]])
    J = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    _, res_c, (J_c,) = correct_residuals_and_jacobians(loss, res, [J])
    np.testing.assert_allclose(res_c, 0.0)
    np.testing.assert_allclose(J_c, 0.0)


def test_losses_are_jittable_and_vmappable():
    s = jnp.linspace(0.1, 5.0, 16)
    for loss in LOSSES:
        out = jax.jit(lambda t: loss.evaluate(t)[0])(s)
        assert out.shape == s.shape
        assert bool(jnp.all(jnp.isfinite(out)))
