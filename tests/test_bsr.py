"""Block-sparse ops tests — the reference pattern of checking every sparse
op against a dense computation on random problems
(block_sparse_matrix_test.cc, SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.ops import bsr
from ceres_tpu.program import CompiledProgram


def make_ba_like_problem(n_cams=4, n_pts=12, seed=0):
    """Small BA-shaped problem: 2-residual blocks touching (cam 9, pt 3)."""
    rng = np.random.default_rng(seed)
    cams = [rng.standard_normal(9) * 0.1 for _ in range(n_cams)]
    pts = [rng.standard_normal(3) for _ in range(n_pts)]

    def reproj(cam, pt, data):
        # A nonlinear toy projection with the right block structure.
        p = pt + cam[:3]
        d = jnp.sum(cam[3:6] * p) + 1.0
        u = p[:2] / d * (1.0 + cam[6] * jnp.sum(p * p))
        return u - data

    cost = ct.AutoDiffCostFunction(reproj, 2, [9, 3])
    # Observations from a ground-truth model + noise so the global basin is
    # shared across solver configurations.
    true_cams = [c + 0.05 * rng.standard_normal(9) for c in cams]
    true_pts = [q + 0.05 * rng.standard_normal(3) for q in pts]
    p = ct.Problem()
    for i in range(n_cams):
        for j in range(n_pts):
            if (i + j) % 3 == 0:  # sparse visibility
                continue
            import jax.numpy as _jnp

            data = np.asarray(
                reproj(_jnp.asarray(true_cams[i]), _jnp.asarray(true_pts[j]), 0.0)
            ) + 0.001 * rng.standard_normal(2)
            p.add_residual_block(cost, None, [cams[i], pts[j]], data=data)
    return p, cams, pts


@pytest.fixture(scope="module")
def ba_setup():
    p, cams, pts = make_ba_like_problem()
    prog = CompiledProgram(p)
    x = prog.initial_state()
    cost, res, grad, values = prog.evaluate_bsr(x)
    meta = bsr.build_meta(prog)
    J = np.asarray(bsr.to_dense(meta, values))
    return prog, meta, values, J, np.asarray(res), np.asarray(grad)


def test_dense_equivalence_shapes(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    assert J.shape == (prog.num_residuals, prog.tangent_size)
    assert meta.num_var_blocks == 16


def test_right_multiply_matches_dense(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    rng = np.random.default_rng(1)
    v = rng.standard_normal(prog.tangent_size)
    got = np.asarray(bsr.right_multiply(meta, values, jnp.asarray(v)))
    np.testing.assert_allclose(got, J @ v, rtol=1e-12, atol=1e-12)


def test_left_multiply_matches_dense(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    rng = np.random.default_rng(2)
    u = rng.standard_normal(prog.num_residuals)
    got = np.asarray(bsr.left_multiply(meta, values, jnp.asarray(u)))
    np.testing.assert_allclose(got, J.T @ u, rtol=1e-12, atol=1e-12)


def test_gradient_matches_jt_r(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    np.testing.assert_allclose(grad, J.T @ res, rtol=1e-12, atol=1e-12)


def test_squared_column_norm(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    got = np.asarray(bsr.squared_column_norm(meta, values))
    np.testing.assert_allclose(got, (J * J).sum(axis=0), rtol=1e-12)


def test_scale_columns(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    rng = np.random.default_rng(3)
    s = rng.uniform(0.5, 2.0, prog.tangent_size)
    vs = bsr.scale_columns(meta, values, jnp.asarray(s))
    got = np.asarray(bsr.to_dense(meta, vs))
    np.testing.assert_allclose(got, J * s[None, :], rtol=1e-12)


def test_block_diag_jtj(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    D = np.full(prog.tangent_size, 0.7)
    blocks = bsr.block_diag_jtj(meta, values, jnp.asarray(D))
    A = J.T @ J + np.diag(D * D)
    for f, blk in zip(meta.families, blocks):
        blk = np.asarray(blk)
        for i in range(f.num_var):
            o = f.tangent_offset + i * f.t
            np.testing.assert_allclose(
                blk[i], A[o : o + f.t, o : o + f.t], rtol=1e-10
            )


def test_block_jacobi_inverse(ba_setup):
    prog, meta, values, J, res, grad = ba_setup
    D = jnp.full(prog.tangent_size, 0.7)
    blocks = bsr.block_diag_jtj(meta, values, D)
    factors = bsr.factorize_block_diag(blocks)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal(prog.tangent_size))
    out = np.asarray(bsr.apply_block_diag_inverse(meta, factors, v))
    # Check blockwise: M out == v
    A = J.T @ J + np.diag(np.asarray(D) ** 2)
    for f in meta.families:
        for i in range(f.num_var):
            o = f.tangent_offset + i * f.t
            blk = A[o : o + f.t, o : o + f.t]
            np.testing.assert_allclose(
                blk @ out[o : o + f.t], np.asarray(v[o : o + f.t]), rtol=1e-8
            )


def test_cg_solves_spd_system():
    from ceres_tpu.solvers.linear.cg import conjugate_gradients

    rng = np.random.default_rng(5)
    n = 30
    A = rng.standard_normal((n, n))
    A = jnp.asarray(A @ A.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    res = conjugate_gradients(
        lambda x: A @ x, b, jnp.zeros(n), max_num_iterations=200, r_tolerance=1e-12
    )
    x_true = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6, atol=1e-8)
    assert int(res.termination) == 1


def test_cgnr_end_to_end_matches_dense_qr():
    p1, _, _ = make_ba_like_problem(seed=7)
    p2, _, _ = make_ba_like_problem(seed=7)
    s1 = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.CGNR,
            preconditioner_type=ct.PreconditionerType.JACOBI,
            max_num_iterations=60,
        ),
        p1,
    )
    s2 = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.DENSE_QR, max_num_iterations=60
        ),
        p2,
    )
    assert s1.is_solution_usable() and s2.is_solution_usable()
    # Same final cost within the iterative-solver tolerance.
    assert abs(s1.final_cost - s2.final_cost) < 1e-4 * max(1.0, s2.final_cost)
    assert s1.linear_solver_type_used == ct.LinearSolverType.CGNR
