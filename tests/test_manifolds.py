"""Manifold axiom tests — port of the reference's generic axioms
(manifold_test_utils.h:386: Plus(x,0)=x, Minus(Plus(x,d),x)=d,
PlusJacobian = d Plus/d delta |_0, MinusJacobian consistency) applied to
every manifold, plus batching behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import (
    AutoDiffManifold,
    EigenQuaternionManifold,
    EuclideanManifold,
    LineManifold,
    ProductManifold,
    QuaternionManifold,
    SphereManifold,
    SubsetManifold,
)


def rand_ambient(m, rng):
    x = rng.standard_normal(m.ambient_size)
    name = type(m).__name__
    if "Quaternion" in name:
        x /= np.linalg.norm(x)
    if name == "SphereManifold":
        x /= np.linalg.norm(x)
    if name == "LineManifold":
        n = m.ambient_size // 2
        x[n:] /= np.linalg.norm(x[n:])
    if name == "ProductManifold":
        # First factor in the fixture is a quaternion: must be unit norm
        # (the closed-form Jacobians assume it, as in the reference).
        x[:4] /= np.linalg.norm(x[:4])
    return jnp.asarray(x)


MANIFOLDS = [
    EuclideanManifold(3),
    SubsetManifold(4, [1, 3]),
    QuaternionManifold(),
    EigenQuaternionManifold(),
    SphereManifold(4),
    LineManifold(3),
    ProductManifold(QuaternionManifold(), EuclideanManifold(3)),
    AutoDiffManifold(
        lambda x, d: x * jnp.exp(d), lambda y, x: jnp.log(y / x), 2, 2
    ),
]


def ids(m):
    return type(m).__name__


@pytest.mark.parametrize("m", MANIFOLDS, ids=ids)
def test_plus_zero_is_identity(m):
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rand_ambient(m, rng)
        if type(m).__name__ == "AutoDiffManifold":
            x = jnp.abs(x) + 0.1
        xp = m.plus(x, jnp.zeros(m.tangent_size))
        np.testing.assert_allclose(xp, x, atol=1e-12)


@pytest.mark.parametrize("m", MANIFOLDS, ids=ids)
def test_minus_plus_round_trip(m):
    rng = np.random.default_rng(1)
    for _ in range(5):
        x = rand_ambient(m, rng)
        if type(m).__name__ == "AutoDiffManifold":
            x = jnp.abs(x) + 0.1
        d = jnp.asarray(rng.standard_normal(m.tangent_size) * 0.3)
        y = m.plus(x, d)
        d2 = m.minus(y, x)
        np.testing.assert_allclose(d2, d, atol=1e-9)


@pytest.mark.parametrize("m", MANIFOLDS, ids=ids)
def test_plus_jacobian_matches_autodiff(m):
    rng = np.random.default_rng(2)
    x = rand_ambient(m, rng)
    if type(m).__name__ == "AutoDiffManifold":
        x = jnp.abs(x) + 0.1
    J = m.plus_jacobian(x)
    assert J.shape == (m.ambient_size, m.tangent_size)
    J_ad = jax.jacfwd(lambda d: m.plus(x, d))(jnp.zeros(m.tangent_size))
    np.testing.assert_allclose(J, J_ad, atol=1e-9)


@pytest.mark.parametrize("m", MANIFOLDS, ids=ids)
def test_minus_jacobian_matches_autodiff(m):
    rng = np.random.default_rng(3)
    x = rand_ambient(m, rng)
    if type(m).__name__ == "AutoDiffManifold":
        x = jnp.abs(x) + 0.1
    J = m.minus_jacobian(x)
    assert J.shape == (m.tangent_size, m.ambient_size)
    J_ad = jax.jacfwd(lambda y: m.minus(y, x))(x)
    np.testing.assert_allclose(J, J_ad, atol=1e-9)


@pytest.mark.parametrize("m", MANIFOLDS, ids=ids)
def test_minus_jacobian_times_plus_jacobian_is_identity(m):
    """MinusJacobian(x) * PlusJacobian(x) == I (manifold_test_utils.h)."""
    rng = np.random.default_rng(4)
    x = rand_ambient(m, rng)
    if type(m).__name__ == "AutoDiffManifold":
        x = jnp.abs(x) + 0.1
    P = m.plus_jacobian(x)
    M = m.minus_jacobian(x)
    np.testing.assert_allclose(M @ P, jnp.eye(m.tangent_size), atol=1e-9)


def test_quaternion_plus_preserves_norm():
    m = QuaternionManifold()
    rng = np.random.default_rng(5)
    x = rand_ambient(m, rng)
    d = jnp.asarray(rng.standard_normal(3))
    y = m.plus(x, d)
    np.testing.assert_allclose(jnp.linalg.norm(y), 1.0, atol=1e-12)


def test_sphere_plus_preserves_norm():
    m = SphereManifold(5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(5)) * 2.5
    d = jnp.asarray(rng.standard_normal(4) * 0.3)
    y = m.plus(x, d)
    np.testing.assert_allclose(jnp.linalg.norm(y), jnp.linalg.norm(x), atol=1e-10)


def test_subset_holds_constants():
    m = SubsetManifold(4, [0, 2])
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    y = m.plus(x, jnp.asarray([10.0, 20.0]))
    np.testing.assert_allclose(y, jnp.asarray([1.0, 12.0, 3.0, 24.0]))


def test_manifold_vmaps():
    m = QuaternionManifold()
    rng = np.random.default_rng(7)
    xs = rng.standard_normal((16, 4))
    xs = jnp.asarray(xs / np.linalg.norm(xs, axis=1, keepdims=True))
    ds = jnp.asarray(rng.standard_normal((16, 3)) * 0.1)
    ys = jax.vmap(m.plus)(xs, ds)
    np.testing.assert_allclose(jnp.linalg.norm(ys, axis=1), 1.0, atol=1e-12)
    Js = jax.vmap(m.plus_jacobian)(xs)
    assert Js.shape == (16, 4, 3)


def test_plus_jacobian_columns_rows_match_plus_jacobian():
    """The rows-form tangent-basis columns (the jt-mode chain rule input,
    eval_fused) must equal the columns of plus_jacobian for every
    supporting manifold, across a batch of random states."""
    import jax.numpy as jnp
    from ceres_tpu import manifolds as mf

    rng = np.random.default_rng(11)
    cases = [
        mf.EuclideanManifold(5),
        mf.SubsetManifold(4, [1, 3]),
        mf.QuaternionManifold(),
        mf.EigenQuaternionManifold(),
        mf.ProductManifold(mf.QuaternionManifold(), mf.EuclideanManifold(6)),
        mf.ProductManifold(mf.EuclideanManifold(2),
                           mf.EigenQuaternionManifold()),
    ]
    for m in cases:
        assert m.supports_rows_columns
        rows = 7
        X = rng.standard_normal((m.ambient_size, rows))
        # normalize quaternion sub-blocks so plus_jacobian is on-manifold
        X = X / np.linalg.norm(X, axis=0, keepdims=True)
        cols = m.plus_jacobian_columns_rows(jnp.asarray(X))
        assert len(cols) == m.tangent_size
        for j in range(rows):
            J = np.asarray(m.plus_jacobian(jnp.asarray(X[:, j])))
            for d in range(m.tangent_size):
                np.testing.assert_allclose(
                    np.asarray(cols[d])[:, j], J[:, d], atol=1e-12,
                    err_msg=f"{m} col {d} row {j}")
