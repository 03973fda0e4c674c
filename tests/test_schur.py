"""Schur pipeline tests: partitioned products vs dense, implicit Schur
complement vs explicit, end-to-end solver-equivalence matrix (the analog of
the reference's 89 generated BA config tests, bundle_adjustment_test_util.h:
every config must match a reference config within tolerance)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.ops import bsr
from ceres_tpu.ops import partition as pt
from ceres_tpu.program import CompiledProgram
from ceres_tpu.utils import ordering


@pytest.fixture(scope="module")
def ba_setup():
    b = bal.synthetic_bal(num_cameras=4, num_points=40, visibility=0.5, noise=0.3, seed=5)
    bp = bal.perturb(b, rotation_sigma=0.05, translation_sigma=0.2, point_sigma=0.2)
    p, cams, pts = bal.build_problem(bp)
    prog = CompiledProgram(p)
    x = prog.initial_state()
    _, res, _, values = prog.evaluate_bsr(x)
    meta = bsr.build_meta(prog)
    e_fams = ordering.eligible_e_sets(prog)
    pm = pt.build_partition(meta, e_fams)
    J = np.asarray(bsr.to_dense(meta, values))
    # column masks for e and f partitions
    e_cols = np.zeros(prog.tangent_size, bool)
    for fi in pm.e_family_indices:
        f = prog.families[fi]
        e_cols[f.tangent_offset : f.tangent_offset + f.num_var * f.tsize] = True
    return prog, pm, values, J, np.asarray(res), e_cols


def test_auto_ordering_picks_points(ba_setup):
    prog, pm, values, J, res, e_cols = ba_setup
    # points: 40 blocks of size 3 => e_size = 120
    assert pm.e_size == 120
    assert pm.f_size == 36


def test_partitioned_products_match_dense(ba_setup):
    prog, pm, values, J, res, e_cols = ba_setup
    E = J[:, e_cols]
    F = J[:, ~e_cols]
    rng = np.random.default_rng(0)
    y = rng.standard_normal(pm.e_size)
    z = rng.standard_normal(pm.f_size)
    u = rng.standard_normal(J.shape[0])
    np.testing.assert_allclose(
        np.asarray(pt.right_multiply_e(pm, values, jnp.asarray(y))), E @ y, rtol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(pt.right_multiply_f(pm, values, jnp.asarray(z))), F @ z, rtol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(pt.left_multiply_e(pm, values, jnp.asarray(u))), E.T @ u, rtol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(pt.left_multiply_f(pm, values, jnp.asarray(u))), F.T @ u, rtol=1e-11
    )


def test_implicit_schur_multiply_matches_explicit(ba_setup):
    from ceres_tpu.solvers.linear.implicit_schur import (
        build_schur_system,
        schur_multiply,
    )

    prog, pm, values, J, res, e_cols = ba_setup
    E = J[:, e_cols]
    F = J[:, ~e_cols]
    rng = np.random.default_rng(1)
    D = jnp.asarray(rng.uniform(0.1, 1.0, prog.tangent_size))
    D_e = np.asarray(pt.extract_e(pm, D))
    D_f = np.asarray(pt.extract_f(pm, D))
    sys = build_schur_system(pm, values, jnp.asarray(res), jnp.asarray(D_e))
    M = E.T @ E + np.diag(D_e**2)
    S = F.T @ F + np.diag(D_f**2) - F.T @ E @ np.linalg.solve(M, E.T @ F)
    z = rng.standard_normal(pm.f_size)
    got = np.asarray(schur_multiply(pm, values, sys, jnp.asarray(D_f), jnp.asarray(z)))
    np.testing.assert_allclose(got, S @ z, rtol=1e-8, atol=1e-8)
    # rhs check: F'b - F'E M^-1 E'b
    rhs_expected = F.T @ res - F.T @ E @ np.linalg.solve(M, E.T @ res)
    np.testing.assert_allclose(np.asarray(sys.rhs), rhs_expected, rtol=1e-8)


def test_dense_schur_solve_matches_full_normal_equations(ba_setup):
    from ceres_tpu.solvers.linear.dense_schur import dense_schur_solve

    prog, pm, values, J, res, e_cols = ba_setup
    rng = np.random.default_rng(2)
    D = rng.uniform(0.1, 1.0, prog.tangent_size)
    y = np.asarray(dense_schur_solve(pm, values, jnp.asarray(res), jnp.asarray(D)))
    A = J.T @ J + np.diag(D * D)
    y_true = np.linalg.solve(A, J.T @ res)
    np.testing.assert_allclose(y, y_true, rtol=1e-7, atol=1e-9)


def test_schur_jacobi_blocks_match_explicit(ba_setup):
    from ceres_tpu.solvers.linear.implicit_schur import (
        build_schur_system,
        schur_jacobi_blocks,
    )

    prog, pm, values, J, res, e_cols = ba_setup
    rng = np.random.default_rng(3)
    D = jnp.asarray(rng.uniform(0.1, 1.0, prog.tangent_size))
    D_e = np.asarray(pt.extract_e(pm, D))
    D_f = np.asarray(pt.extract_f(pm, D))
    sys = build_schur_system(pm, values, jnp.asarray(res), jnp.asarray(D_e))
    blocks = schur_jacobi_blocks(pm, values, sys, jnp.asarray(D_f))
    E = J[:, e_cols]
    F = J[:, ~e_cols]
    M = E.T @ E + np.diag(D_e**2)
    S = F.T @ F + np.diag(D_f**2) - F.T @ E @ np.linalg.solve(M, E.T @ F)
    for (off, nv, t, _), blk in zip(pm.f_fams, blocks):
        blk = np.asarray(blk)
        for i in range(nv):
            o = off + i * t
            np.testing.assert_allclose(blk[i], S[o : o + t, o : o + t], rtol=1e-7)


@pytest.mark.parametrize(
    "lst",
    ["DENSE_SCHUR", "SPARSE_SCHUR", "ITERATIVE_SCHUR", "CGNR"],
)
def test_ba_solver_config_matrix(lst):
    """Every solver config reaches the DENSE_QR reference final cost within
    tolerance (the kResidualTolerance pattern)."""
    def make():
        b = bal.synthetic_bal(num_cameras=8, num_points=80, visibility=0.6,
                              noise=0.05, seed=11)
        bp = bal.perturb(b, rotation_sigma=0.01, translation_sigma=0.05,
                         point_sigma=0.05, seed=2)
        return bal.build_problem(bp)

    p_ref, _, _ = make()
    s_ref = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_QR,
                   max_num_iterations=80),
        p_ref,
    )
    p, _, _ = make()
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.parse(lst),
                   max_num_iterations=80),
        p,
    )
    assert s.is_solution_usable()
    assert abs(s.final_cost - s_ref.final_cost) <= 1e-4 * max(1.0, s_ref.final_cost)


def test_iterative_schur_zero_eblocks_falls_back_to_cgnr():
    # A problem with a single family: no valid e/f split.
    x = np.zeros(2)
    p = ct.Problem()
    p.add_residual_block(ct.AutoDiffCostFunction(lambda v: v - 1.0, 2, [2]), None, [x])
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR), p
    )
    assert s.linear_solver_type_used == ct.LinearSolverType.CGNR
    assert s.final_cost < 1e-12


def test_bal_reader_roundtrip(tmp_path):
    b = bal.synthetic_bal(num_cameras=3, num_points=10, seed=1)
    path = tmp_path / "test.bal"
    with open(path, "w") as f:
        f.write(f"{b.num_cameras} {b.num_points} {b.num_observations}\n")
        for k in range(b.num_observations):
            f.write(
                f"{b.camera_index[k]} {b.point_index[k]} "
                f"{b.observations[k,0]:.16e} {b.observations[k,1]:.16e}\n"
            )
        for v in b.cameras.reshape(-1):
            f.write(f"{v:.16e}\n")
        for v in b.points.reshape(-1):
            f.write(f"{v:.16e}\n")
    b2 = bal.read_bal_file(path)
    np.testing.assert_allclose(b2.cameras, b.cameras)
    np.testing.assert_allclose(b2.points, b.points)
    np.testing.assert_allclose(b2.observations, b.observations)


def test_tri_inverse_lower_blocked():
    """tri_inverse_lower (recursive block doubling) matches the direct
    inverse for non-pow2 sizes incl. the 144 = 9*16 camera case."""
    import numpy as np
    from ceres_tpu.solvers.linear.dense import chol_solve_mxu, tri_inverse_lower

    rng = np.random.default_rng(0)
    for n in (5, 16, 37, 144, 256):
        A = rng.normal(size=(n, n))
        S = A @ A.T + n * np.eye(n)
        L = np.linalg.cholesky(S)
        Linv = np.asarray(tri_inverse_lower(jnp.asarray(L), base=16))
        np.testing.assert_allclose(Linv @ L, np.eye(n), atol=1e-8)
        rhs = rng.normal(size=(n,))
        x = np.asarray(chol_solve_mxu(jnp.asarray(L), jnp.asarray(rhs)))
        np.testing.assert_allclose(S @ x, rhs, rtol=1e-7, atol=1e-8)


def test_tri_inverse_lower_f32():
    import numpy as np
    from ceres_tpu.solvers.linear.dense import tri_inverse_lower

    rng = np.random.default_rng(1)
    A = rng.normal(size=(144, 144)).astype(np.float32)
    S = A @ A.T + 144 * np.eye(144, dtype=np.float32)
    L = np.linalg.cholesky(S).astype(np.float32)
    Linv = np.asarray(tri_inverse_lower(jnp.asarray(L), base=16))
    assert Linv.dtype == np.float32
    np.testing.assert_allclose(Linv @ L, np.eye(144), atol=5e-5)
