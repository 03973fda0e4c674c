"""Sparse direct solve at SLAM scale (BASELINE config 5 regime).

Times the native sparse Cholesky on a 100k-pose 3D pose-graph normal
matrix (6x6 blocks, odometry chain + 2% loop closures): ordering +
symbolic analysis, numeric factorization, and triangular solve, plus
parity of the solution against scipy.

Measured (this image's host, 2026-08, round 3): n=600k, nnz(A)=10.9M ->
nnzL=10.5M (17.6/col, minimum degree), analysis ~1.4 s (was ~8 s in
round 2; supervariable compression runs the orderings on the 6x-smaller
quotient graph and the pattern permutation moved to native
ct_permute_pattern — CHOLMOD's supernodal-analysis role,
suitesparse.cc:619), numeric factor ~0.6 s and solve ~0.04 s (per LM
iteration). Analysis is now <= ~2x the numeric factor, so first-solve
latency is no longer analysis-walled; the simplicial up-looking numeric
kernel stays (revisit if a workload shows >100 nnzL/col —
supernodal/BLAS3 territory, eigensparse.cc:214 regime).

Run: PYTHONPATH=. python benchmarks/sparse_direct_bench.py [num_poses]
"""
import json
import sys
import time

import numpy as np
import scipy.sparse as sp

from ceres_tpu.native import SparseCholesky


def pose_graph_pattern(num_poses: int, t: int = 6, lc_fraction: float = 0.02,
                       seed: int = 0):
    rng = np.random.default_rng(seed)
    edges = [(i, i + 1) for i in range(num_poses - 1)]
    n_lc = max(1, int(num_poses * lc_fraction))
    a = rng.integers(0, num_poses - 10, n_lc)
    b = np.minimum(a + rng.integers(5, 2000, n_lc), num_poses - 1)
    edges += list(zip(a.tolist(), b.tolist()))
    rows, cols = [], []
    for (i, j) in edges:
        rows += [i, j]
        cols += [j, i]
    rows += list(range(num_poses))
    cols += list(range(num_poses))
    Ab = sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                       shape=(num_poses, num_poses))
    A = sp.kron(Ab, np.ones((t, t)), format="csr")
    n = num_poses * t
    vals = rng.standard_normal(A.nnz) * 0.01
    A2 = sp.csr_matrix((vals, A.indices, A.indptr), shape=(n, n))
    A2 = A2 + A2.T
    A2 = A2 + sp.diags(np.abs(A2).sum(axis=1).A.ravel() + 1.0)
    A2 = A2.tocsr()
    A2.sort_indices()
    return A2


def main(num_poses=100_000, lc_fraction=0.02):
    A = pose_graph_pattern(num_poses, lc_fraction=lc_fraction)
    n = A.shape[0]
    t0 = time.time()
    ch = SparseCholesky(n, A.indptr.astype(np.int64),
                        A.indices.astype(np.int32))
    t_analyze = time.time() - t0
    t0 = time.time()
    ok = ch.factorize(A.data)
    t_factor = time.time() - t0
    # WARM refactorization: the per-LM-iteration cost (panels and update
    # lists already paged in) — what the solver actually pays
    t_refactor = 1e9
    for _ in range(3):
        t0 = time.time()
        ok = ch.factorize(A.data) and ok
        t_refactor = min(t_refactor, time.time() - t0)
    # simplicial comparison (the r4 kernel, same symbolic): the
    # supernodal-vs-simplicial speedup on THIS pattern
    from ceres_tpu.native import get_lib
    lib = get_lib()
    pv = np.ascontiguousarray(A.data[ch.value_perm])
    t_simpl = 1e9
    for _ in range(2):
        t0 = time.time()
        lib.ct_chol_numeric(ch.n, ch.pindptr, ch.pindices, pv, ch.Lp,
                            ch.parent, ch.Li, ch.Lx)
        t_simpl = min(t_simpl, time.time() - t0)
    ch.factorize(A.data)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    t0 = time.time()
    x = ch.solve(b)
    t_solve = time.time() - t0
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    print(json.dumps({
        "metric": (f"sparse direct 3D pose graph ({num_poses} poses, "
                   f"{lc_fraction:.0%} loop closures)"),
        "n": n, "nnz_A": int(A.nnz), "nnz_L": int(ch.nnzL),
        "num_supernodes": int(lib.ct_super_nsn(ch._handle)),
        "analyze_s": round(t_analyze, 2),
        "factor_s": round(t_factor, 3),
        "refactor_warm_s": round(t_refactor, 3),
        "simplicial_warm_s": round(t_simpl, 3),
        "supernodal_speedup": round(t_simpl / t_refactor, 2),
        "solve_s": round(t_solve, 3),
        "ok": bool(ok), "rel_residual": rel,
    }))
    assert ok and rel < 1e-12


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000,
         float(sys.argv[2]) if len(sys.argv) > 2 else 0.02)
