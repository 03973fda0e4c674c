"""Tests for the satellite public APIs: Covariance, TinySolver,
GradientProblem, cubic interpolation, dogleg, line search minimizer
(SURVEY.md §2 L8 rows)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct


# ---------------------------------------------------------------- covariance


def _linear_problem():
    # r = A x - b with known covariance (A'A)^{-1}.
    rng = np.random.default_rng(0)
    A = rng.standard_normal((10, 3))
    b = rng.standard_normal(10)
    x = np.zeros(3)
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.asarray(A) @ v - jnp.asarray(b), 10, [3]),
        None,
        [x],
    )
    return p, A, x


@pytest.mark.parametrize("alg", ["DENSE_SVD", "SPARSE_QR"])
def test_covariance_linear(alg):
    p, A, x = _linear_problem()
    ct.solve(ct.Options(max_num_iterations=20), p)
    cov = ct.Covariance(
        ct.CovarianceOptions(algorithm_type=ct.CovarianceAlgorithmType.parse(alg))
    )
    assert cov.compute([(x, x)], p)
    C = cov.get_covariance_block(x, x)
    np.testing.assert_allclose(C, np.linalg.inv(A.T @ A), rtol=1e-8)


def test_covariance_rank_deficient_svd():
    # Two identical columns: J'J singular; SPARSE_QR must fail, DENSE_SVD
    # with null_space_rank=1 must succeed (covariance.h semantics).
    x = np.zeros(2)
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.asarray([v[0] + v[1]]), 1, [2]), None, [x]
    )
    qr_cov = ct.Covariance(
        ct.CovarianceOptions(algorithm_type=ct.CovarianceAlgorithmType.SPARSE_QR)
    )
    assert not qr_cov.compute([(x, x)], p)
    svd_cov = ct.Covariance(
        ct.CovarianceOptions(
            algorithm_type=ct.CovarianceAlgorithmType.DENSE_SVD, null_space_rank=1
        )
    )
    assert svd_cov.compute([(x, x)], p)
    C = svd_cov.get_covariance_block(x, x)
    assert np.all(np.isfinite(C))


def test_covariance_ill_conditioned_qr_vs_normal_equations():
    """cond(J) ~ 1e8: the true QR path (factor J itself) matches the
    DENSE_SVD reference to ~sqrt(eps)*cond digits, while the
    normal-equations fast path works on J'J with cond ~ 1e16 and must
    either fail the rcond gate or lose the answer
    (covariance_impl.cc:539 is QR for exactly this reason)."""
    rng = np.random.default_rng(3)
    Q1, _ = np.linalg.qr(rng.standard_normal((12, 3)))
    Q2, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    s = np.asarray([1.0, 1e-4, 1e-8])
    A = Q1 @ np.diag(s) @ Q2
    x = np.zeros(3)
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.asarray(A) @ v, 12, [3]),
        None, [x],
    )
    ref = Q2.T @ np.diag(1.0 / (s * s)) @ Q2  # (A'A)^{-1}

    qr = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.SPARSE_QR,
        min_reciprocal_condition_number=1e-18))
    assert qr.compute([(x, x)], p)
    C = qr.get_covariance_block(x, x)
    np.testing.assert_allclose(C, ref, rtol=1e-6)

    ne = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.SPARSE_QR,
        min_reciprocal_condition_number=1e-18,
        use_normal_equations=True))
    ok = ne.compute([(x, x)], p)
    if ok:  # if the f64 Cholesky squeaked through, the answer is garbage
        C2 = ne.get_covariance_block(x, x)
        assert np.max(np.abs(C2 - ref)) / np.max(np.abs(ref)) > 1e-4


def test_covariance_qr_multi_block_matches_svd():
    """QR path on a multi-block problem with a constant block: agrees with
    DENSE_SVD on every requested pair."""
    rng = np.random.default_rng(5)
    xs = [rng.standard_normal(2), rng.standard_normal(3),
          rng.standard_normal(2)]
    p = ct.Problem()
    A1 = rng.standard_normal((4, 5))
    p.add_residual_block(
        ct.AutoDiffCostFunction(
            lambda a, b: jnp.asarray(A1) @ jnp.concatenate([a, b]) - 1.0,
            4, [2, 3]), None, [xs[0], xs[1]])
    A2 = rng.standard_normal((5, 5))
    p.add_residual_block(
        ct.AutoDiffCostFunction(
            lambda b, c: jnp.asarray(A2) @ jnp.concatenate([b, c]),
            5, [3, 2]), None, [xs[1], xs[2]])
    A3 = rng.standard_normal((3, 2))
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda c: jnp.asarray(A3) @ c - 0.5, 3, [2]),
        None, [xs[2]])
    p.set_parameter_block_constant(xs[0])
    pairs = [(xs[1], xs[1]), (xs[1], xs[2]), (xs[2], xs[2])]
    qr = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.SPARSE_QR))
    svd = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.DENSE_SVD))
    assert qr.compute(pairs, p) and svd.compute(pairs, p)
    for a, b in pairs:
        np.testing.assert_allclose(
            qr.get_covariance_block(a, b), svd.get_covariance_block(a, b),
            rtol=1e-8, atol=1e-12)


def test_covariance_tangent_space_quaternion():
    q = np.asarray([1.0, 0.0, 0.0, 0.0])
    p = ct.Problem()
    p.add_parameter_block(q, manifold=ct.QuaternionManifold())
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: v - jnp.asarray([1.0, 0, 0, 0]), 4, [4]),
        None,
        [q],
    )
    cov = ct.Covariance()
    assert cov.compute([(q, q)], p)
    Ct = cov.get_covariance_block(q, q, lift_to_ambient=False)
    assert Ct.shape == (3, 3)
    Ca = cov.get_covariance_block(q, q, lift_to_ambient=True)
    assert Ca.shape == (4, 4)


# ---------------------------------------------------------------- tiny solver


def test_tiny_solver_single():
    def residual(x, data):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    ts = ct.TinySolver(residual)
    x, s = ts.solve(jnp.asarray([-1.2, 1.0]))
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-6)
    assert float(s.final_cost) < 1e-12


def test_tiny_solver_batch():
    # B independent curve fits in one launch.
    B = 64
    rng = np.random.default_rng(1)
    true_ab = rng.uniform(0.5, 2.0, (B, 2))
    ts_x = np.linspace(0, 1, 8)
    ys = true_ab[:, :1] * np.exp(true_ab[:, 1:] * ts_x[None, :])

    def residual(ab, y):
        return y - ab[0] * jnp.exp(ab[1] * jnp.asarray(ts_x))

    ts = ct.TinySolver(residual)
    x0 = jnp.ones((B, 2))
    xs, s = ts.solve_batch(x0, jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(xs), true_ab, rtol=1e-4)
    assert np.all(np.asarray(s.final_cost) < 1e-10)


# ------------------------------------------------------------ gradient problem


def test_gradient_problem_with_manifold():
    from ceres_tpu.gradient_problem import GradientProblem, solve_gradient_problem

    # minimize angle between quaternion-rotated vector and target.
    target = jnp.asarray([0.0, 0.0, 1.0])

    def cost(q):
        from ceres_tpu import rotation as rot

        v = rot.unit_quaternion_rotate_point(q, jnp.asarray([1.0, 0.0, 0.0]))
        return jnp.sum((v - target) ** 2)

    q = np.asarray([1.0, 0.0, 0.0, 0.0])
    gp = GradientProblem(cost, 4, manifold=ct.QuaternionManifold())
    s = solve_gradient_problem(
        ct.Options(minimizer_type=ct.MinimizerType.LINE_SEARCH, max_num_iterations=200),
        gp,
        q,
    )
    assert s.final_cost < 1e-12
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)


# --------------------------------------------------------- cubic interpolation


def test_cubic_interpolator_reproduces_quadratic():
    # The Catmull-Rom kernel (as in the reference) reproduces polynomials up
    # to degree 2 exactly away from boundaries.
    xs = np.arange(10.0)
    f = lambda x: 0.5 * x**2 - x + 3.0
    interp = ct.CubicInterpolator(ct.Grid1D(f(xs)))
    for x in [2.5, 3.25, 6.75]:
        np.testing.assert_allclose(float(interp(x)), f(x), rtol=1e-10)
    # derivative via AD matches analytic
    g = jax.grad(lambda x: interp(x))(jnp.asarray(4.5))
    np.testing.assert_allclose(float(g), 4.5 - 1.0, rtol=1e-10)


def test_bicubic_interpolator_linear_exact():
    r, c = np.meshgrid(np.arange(8.0), np.arange(9.0), indexing="ij")
    vals = 2 * r + 3 * c + 1
    interp = ct.BiCubicInterpolator(ct.Grid2D(vals))
    np.testing.assert_allclose(float(interp(3.3, 4.7)), 2 * 3.3 + 3 * 4.7 + 1, rtol=1e-10)
    gr = jax.grad(lambda r: interp(r, 4.7))(jnp.asarray(3.3))
    np.testing.assert_allclose(float(gr), 2.0, atol=1e-10)


def test_interpolated_cost_function():
    # cubic_interpolation.h use case: sampled data inside an autodiff cost.
    xs = np.arange(20.0)
    data = np.sin(xs / 3.0)
    interp = ct.CubicInterpolator(ct.Grid1D(data))
    x = np.asarray([2.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.atleast_1d(interp(v[0]) - 1.0), 1, [1]),
        None,
        [x],
    )
    s = ct.solve(ct.Options(max_num_iterations=100), p)
    # sin(x/3)=1 => x = 3*pi/2 ~ 4.712; interpolation error is small
    assert abs(x[0] - 3 * np.pi / 2) < 0.05


# ------------------------------------------------------------------- dogleg


@pytest.mark.parametrize("dt", ["TRADITIONAL_DOGLEG", "SUBSPACE_DOGLEG"])
def test_dogleg_powell(dt):
    import sys
    sys.path.insert(0, "tests")
    from test_solver import make_powell

    p, xs = make_powell()
    s = ct.solve(
        ct.Options(
            trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
            dogleg_type=ct.DoglegType.parse(dt),
            linear_solver_type=ct.LinearSolverType.DENSE_QR,
            max_num_iterations=100,
        ),
        p,
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < 1e-10


def test_dogleg_rejects_iterative_solvers():
    p = ct.Problem()
    x = np.zeros(2)
    p.add_residual_block(ct.AutoDiffCostFunction(lambda v: v, 2, [2]), None, [x])
    s = ct.solve(
        ct.Options(
            trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
            linear_solver_type=ct.LinearSolverType.CGNR,
        ),
        p,
    )
    assert s.termination_type == ct.TerminationType.FAILURE


def test_covariance_sparse_qr_selected_blocks():
    """SPARSE_QR solves only the requested block columns of (J'J)^{-1} on
    the block-sparse structure; values must match DENSE_SVD, and
    unrequested pairs raise."""
    from ceres_tpu.models import bal

    b = bal.synthetic_bal(num_cameras=4, num_points=30, visibility=1.0,
                          noise=0.1, seed=21)
    p, cams, pts = bal.build_problem(b)
    # fix the 7-dof BA gauge (else J'J is rank deficient and compute()
    # correctly returns False, matching the reference's failure)
    p.set_parameter_block_constant(cams[0])
    p.set_parameter_block_constant(pts[0])
    cov_blocks = [(cams[2], cams[2]), (cams[3], cams[2]), (pts[3], pts[3])]

    c_sp = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.SPARSE_QR))
    assert c_sp.compute(cov_blocks, p)
    c_dn = ct.Covariance(ct.CovarianceOptions(
        algorithm_type=ct.CovarianceAlgorithmType.DENSE_SVD))
    assert c_dn.compute(cov_blocks, p)
    for (x1, x2) in cov_blocks + [(cams[2], cams[3])]:
        np.testing.assert_allclose(
            c_sp.get_covariance_block(x1, x2),
            c_dn.get_covariance_block(x1, x2),
            rtol=1e-6, atol=1e-9,
        )
    with pytest.raises(KeyError):
        c_sp.get_covariance_block(pts[4], pts[5])


@pytest.mark.slow
def test_covariance_sparse_qr_slam_scale():
    """SPARSE_QR covariance at SLAM scale (r3: native George-Heath with
    sparse R rows + dense trailing block): a 800-pose 2D pose graph
    (T=2400 tangent) factors and solves in seconds, and matches the
    normal-equations fast path on a well-conditioned problem."""
    import time

    from ceres_tpu.covariance import Covariance, CovarianceOptions
    from ceres_tpu.models import pose_graph as pg

    poses, constraints, _gt = pg.synthetic_2d(
        num_poses=800, loop_closures=30, noise=0.02, seed=3)
    # build_problem_2d fixes the first pose (gauge), so J has full
    # column rank and the QR path is well-posed
    problem, _arrays = pg.build_problem_2d(poses, constraints)
    t0 = time.time()
    cov = Covariance(CovarianceOptions())
    ok = cov.compute([], problem)
    dt_qr = time.time() - t0
    assert ok, "sparse QR covariance failed"
    assert dt_qr < 120.0, f"QR covariance too slow: {dt_qr:.1f}s"

    cov2 = Covariance(CovarianceOptions(use_normal_equations=True))
    assert cov2.compute([], problem)
    import numpy as np
    C1 = cov._cov
    C2 = cov2._cov
    assert C1 is not None and C2 is not None
    num = np.linalg.norm(C1 - C2)
    den = np.linalg.norm(C2)
    assert num / den < 1e-6, f"QR vs normal-eq covariance mismatch {num/den:.2e}"


def test_covariance_schur_tail_parity():
    """Schur-tail sparse QR (r4, VERDICT r3 #8): the dense camera core of
    R comes from chol(S) assembled on the accelerator — must match the
    pure row-Givens QR covariance to fp tolerance on a full-rank BA."""
    import numpy as np

    import ceres_tpu as ct
    from ceres_tpu.covariance import Covariance, CovarianceOptions
    from ceres_tpu.models import bal

    b = bal.synthetic_bal(num_cameras=64, num_points=300, visibility=0.15,
                          noise=0.5, seed=0)
    prob, cams, pts = bal.build_problem_batched(b)
    w = 1e-2  # Tikhonov anchors fix the gauge for BOTH paths
    import jax.numpy as jnp

    anchor_c = ct.AutoDiffCostFunction(lambda c, d: w * (c - d), 9, [9])
    anchor_p = ct.AutoDiffCostFunction(lambda p, d: w * (p - d), 3, [3])
    arr_c, arr_p = prob._block_arrays
    prob.add_residual_block_batch(
        anchor_c, None, [(arr_c, np.arange(b.num_cameras))], data=cams.copy())
    prob.add_residual_block_batch(
        anchor_p, None, [(arr_p, np.arange(b.num_points))], data=pts.copy())
    ct.solve(ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                        max_num_iterations=15), prob)
    cov_tail = Covariance(CovarianceOptions(schur_tail_min_cols=128))
    cov_ref = Covariance(CovarianceOptions(schur_tail_min_cols=0))
    assert cov_tail.compute([], prob)
    assert cov_ref.compute([], prob)
    rel = np.abs(cov_tail._cov - cov_ref._cov).max() / np.abs(
        cov_ref._cov).max()
    assert rel < 1e-7, f"schur-tail covariance mismatch {rel:.2e}"


@pytest.mark.slow
def test_covariance_schur_tail_full_ba_scale():
    """Full-BA covariance at the r3-identified scale wall: a 9*C-wide
    camera core (C=400 -> 3600 columns) where host row-Givens on the
    dense block is the multi-1e11-flop term. With the Schur-tail offload
    the full covariance completes within the budget, and matches the
    normal-equations path (well-conditioned synthetic)."""
    import time

    import numpy as np

    import ceres_tpu as ct
    from ceres_tpu.covariance import Covariance, CovarianceOptions
    from ceres_tpu.models import bal

    b = bal.synthetic_bal_large(num_cameras=400, num_points=2500,
                                mean_track=6.0, cam_window=40, seed=0)
    prob, cams, pts = bal.build_problem_batched(b)
    w = 1e-2
    anchor_c = ct.AutoDiffCostFunction(lambda c, d: w * (c - d), 9, [9])
    anchor_p = ct.AutoDiffCostFunction(lambda p, d: w * (p - d), 3, [3])
    arr_c, arr_p = prob._block_arrays
    prob.add_residual_block_batch(
        anchor_c, None, [(arr_c, np.arange(b.num_cameras))], data=cams.copy())
    prob.add_residual_block_batch(
        anchor_p, None, [(arr_p, np.arange(b.num_points))], data=pts.copy())
    t0 = time.time()
    cov = Covariance(CovarianceOptions())
    ok = cov.compute([], prob)
    dt = time.time() - t0
    assert ok, "schur-tail covariance failed"
    assert dt < 300.0, f"full-BA covariance too slow: {dt:.1f}s"

    cov2 = Covariance(CovarianceOptions(use_normal_equations=True))
    assert cov2.compute([], prob)
    C1, C2 = cov._cov, cov2._cov
    rel = np.linalg.norm(C1 - C2) / np.linalg.norm(C2)
    assert rel < 1e-6, f"covariance mismatch vs normal equations {rel:.2e}"
