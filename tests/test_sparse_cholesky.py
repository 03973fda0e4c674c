"""Native sparse Cholesky + inner-product computer tests (the reference's
sparse_cholesky_test.cc / inner_product_computer_test.cc pattern: compare
against dense computations on random problems)."""
import numpy as np
import pytest
import scipy.sparse as sp

import ceres_tpu as ct
from ceres_tpu.native import SparseCholesky
from ceres_tpu.ops import bsr
from ceres_tpu.ops.inner_product import InnerProductComputer
from ceres_tpu.program import CompiledProgram


def random_spd(n, density_extra=40, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.diags(
        [10.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)], [0, -1, 1]
    ).tolil()
    for _ in range(density_extra):
        i, j = rng.integers(0, n, 2)
        if i != j:
            A[i, j] = A[j, i] = -0.5
    A = A.tocsr()
    A.sort_indices()
    return A


@pytest.mark.parametrize("use_ordering", [False, True])
def test_cholesky_solve_matches_dense(use_ordering):
    n = 200
    A = random_spd(n, seed=1)
    chol = SparseCholesky(n, A.indptr, A.indices, use_ordering=use_ordering)
    assert chol.factorize(A.data)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    x = chol.solve(b)
    np.testing.assert_allclose(A @ x, b, atol=1e-10)


def test_cholesky_refactorize_reuses_symbolic():
    n = 100
    A = random_spd(n, seed=3)
    chol = SparseCholesky(n, A.indptr, A.indices)
    assert chol.factorize(A.data)
    A2 = A.copy()
    A2.data = A2.data * 2.0
    assert chol.factorize(A2.data)
    b = np.ones(n)
    np.testing.assert_allclose(A2 @ chol.solve(b), b, atol=1e-10)


def test_cholesky_detects_indefinite():
    n = 50
    A = random_spd(n, seed=4).tolil()
    A[0, 0] = -1.0
    A = A.tocsr()
    A.sort_indices()
    chol = SparseCholesky(n, A.indptr, A.indices)
    assert not chol.factorize(A.data)


def test_rcm_reduces_fill_on_arrow_matrix():
    # Arrow matrix: natural order produces dense fill; RCM avoids it.
    n = 60
    A = sp.lil_matrix((n, n))
    A[0, :] = 1.0
    A[:, 0] = 1.0
    A.setdiag(10.0)
    A = A.tocsr()
    A.sort_indices()
    с_natural = SparseCholesky(n, A.indptr, A.indices, use_ordering=False)
    c_rcm = SparseCholesky(n, A.indptr, A.indices, use_ordering=True)
    assert c_rcm.nnzL < с_natural.nnzL


def test_inner_product_computer_matches_dense():
    import sys

    sys.path.insert(0, "tests")
    from test_bsr import make_ba_like_problem

    p, _, _ = make_ba_like_problem(seed=13)
    prog = CompiledProgram(p)
    x = prog.initial_state()
    _, res, _, values = prog.evaluate_bsr(x)
    meta = bsr.build_meta(prog)
    J = np.asarray(bsr.to_dense(meta, values))
    ipc = InnerProductComputer(meta)
    D = np.random.default_rng(5).uniform(0.5, 1.5, prog.tangent_size)
    vals = np.asarray(ipc.compute(values, D))
    JtJ = sp.csr_matrix((vals, ipc.indices, ipc.indptr), shape=(ipc.n, ipc.n))
    np.testing.assert_allclose(JtJ.toarray(), J.T @ J + np.diag(D * D), atol=1e-10)


def test_sparse_normal_cholesky_end_to_end():
    from ceres_tpu.models import pose_graph as pg

    def make():
        poses, cons, _ = pg.synthetic_2d(num_poses=50, loop_closures=8, noise=0.02, seed=7)
        return pg.build_problem_2d(poses, cons)[0]

    s_sparse = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
            max_num_iterations=100,
        ),
        make(),
    )
    s_dense = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_QR, max_num_iterations=100),
        make(),
    )
    assert s_sparse.linear_solver_type_used == ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY
    assert s_sparse.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(s_sparse.final_cost - s_dense.final_cost) < 1e-10 * max(
        1.0, s_dense.final_cost
    )


def test_refined_sparse_cholesky_matches_f64():
    from ceres_tpu.native import RefinedSparseCholesky

    n = 150
    A = random_spd(n, seed=7)
    r = RefinedSparseCholesky(n, A.indptr, A.indices, max_num_refinement_iterations=3)
    assert r.factorize(A.data)
    rng = np.random.default_rng(8)
    b = rng.standard_normal(n)
    x = r.solve(b)
    np.testing.assert_allclose(A @ x, b, atol=1e-10)


def test_refined_detects_indefinite():
    from ceres_tpu.native import RefinedSparseCholesky

    n = 30
    A = random_spd(n, seed=9).tolil()
    A[0, 0] = -1.0
    A = A.tocsr()
    A.sort_indices()
    r = RefinedSparseCholesky(n, A.indptr, A.indices)
    assert not r.factorize(A.data)


def test_mixed_precision_sparse_end_to_end():
    from ceres_tpu.models import pose_graph as pg

    poses, cons, _ = pg.synthetic_2d(num_poses=40, loop_closures=6, noise=0.02, seed=2)
    p, _ = pg.build_problem_2d(poses, cons)
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
            use_mixed_precision_solves=True,
            max_num_refinement_iterations=3,
            max_num_iterations=100,
        ),
        p,
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE


def test_mindeg_beats_rcm_on_grid():
    """Quotient-graph minimum degree should show far less fill than RCM on
    a 2-D grid Laplacian (the SLAM-like pattern), and SparseCholesky keeps
    the lower-fill ordering."""
    import scipy.sparse as sp
    from ceres_tpu.native import SparseCholesky, get_lib

    g = 24
    n = g * g
    rows, cols, vals = [], [], []
    for i in range(g):
        for j in range(g):
            a = i * g + j
            rows.append(a); cols.append(a); vals.append(4.0)
            for (di, dj) in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                bi, bj = i + di, j + dj
                if 0 <= bi < g and 0 <= bj < g:
                    rows.append(a); cols.append(bi * g + bj); vals.append(-1.0)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sort_indices()
    lib = get_lib()
    fills = {}
    for name, fn in (("mindeg", lib.ct_mindeg), ("rcm", lib.ct_rcm)):
        perm = np.zeros(n, np.int32)
        fn(n, A.indptr.astype(np.int64), A.indices.astype(np.int32), perm)
        assert sorted(perm.tolist()) == list(range(n))
        sc = SparseCholesky.__new__(SparseCholesky)
        sc.n = n
        fills[name] = sc._symbolic(
            lib, perm, A.indptr.astype(np.int64), A.indices.astype(np.int32)
        )[-1]
    assert fills["mindeg"] < 0.7 * fills["rcm"]
    c = SparseCholesky(n, A.indptr, A.indices)
    assert c.nnzL == fills["mindeg"]
    assert c.factorize(A.data)
    x = c.solve(np.ones(n))
    np.testing.assert_allclose(A @ x, np.ones(n), atol=1e-10)


def test_column_counts_match_full_symbolic():
    """ct_chol_counts (Davis Algorithm 4.2, O(|A| alpha)) must equal the
    ereach-based full symbolic nnz(L) — it is the candidate-ordering
    selector, so a mismatch silently picks wrong orderings."""
    import scipy.sparse as sp
    from ceres_tpu.native import get_lib

    lib = get_lib()
    rng = np.random.default_rng(0)
    for trial in range(4):
        n = 60 + 40 * trial
        density = 0.05 + 0.02 * trial
        M = sp.random(n, n, density=density, random_state=trial)
        A = (M + M.T + sp.eye(n) * n).tocsr()
        A.sort_indices()
        ip = A.indptr.astype(np.int64)
        ix = A.indices.astype(np.int32)
        par = np.zeros(n, np.int32)
        cc = np.zeros(n, np.int64)
        nnz_counts = int(lib.ct_chol_counts(n, ip, ix, par, cc))
        Lp = np.zeros(n + 1, np.int64)
        par2 = np.zeros(n, np.int32)
        nnz_sym = int(lib.ct_chol_symbolic(n, ip, ix, Lp, par2))
        assert nnz_counts == nnz_sym
        assert np.array_equal(np.diff(Lp), cc)


def test_nested_dissection_is_valid_permutation_and_factorizes():
    """ct_nd (recursive level-set bisection, the METIS/CAMD role of
    eigensparse.cc:214) returns a valid permutation on grids, chains, and
    disconnected graphs; the end-to-end pipeline with ND as a candidate
    stays numerically exact."""
    import scipy.sparse as sp
    from ceres_tpu.native import SparseCholesky, get_lib

    lib = get_lib()
    rng = np.random.default_rng(1)
    m = 25
    n = m * m
    # 2D grid + delete some edges to disconnect a corner
    rows, cols = [], []
    for i in range(m):
        for j in range(m):
            k = i * m + j
            if i + 1 < m and not (i < 3 and j < 3):
                rows += [k, k + m]; cols += [k + m, k]
            if j + 1 < m and not (i < 3 and j < 3):
                rows += [k, k + 1]; cols += [k + 1, k]
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    A = (A + sp.eye(n) * 8).tocsr()
    A.sort_indices()
    perm = np.zeros(n, np.int32)
    lib.ct_nd(n, A.indptr.astype(np.int64), A.indices.astype(np.int32), perm)
    assert sorted(perm.tolist()) == list(range(n))
    ch = SparseCholesky(n, A.indptr.astype(np.int64),
                        A.indices.astype(np.int32))
    assert ch.factorize(A.data.astype(np.float64))
    b = rng.standard_normal(n)
    x = ch.solve(b)
    assert np.linalg.norm(A @ x - b) <= 1e-10 * np.linalg.norm(b)
