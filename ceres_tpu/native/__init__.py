"""Native (C++) host components, built on demand with g++ and bound via
ctypes — the role pybind11'd vendor libraries play in the reference.

Currently: simplicial sparse Cholesky with minimum-degree/RCM ordering
(sparse_cholesky.cc), replacing the reference's CHOLMOD/Eigen/cuDSS
backends (sparse_cholesky.cc:46-118 factory).
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "sparse_cholesky.cc"
_SO = _DIR / "_sparse_cholesky.so"

_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ct_rcm.restype = ctypes.c_int32
    lib.ct_rcm.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    lib.ct_mindeg.restype = ctypes.c_int32
    lib.ct_mindeg.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    lib.ct_nd.restype = ctypes.c_int32
    lib.ct_nd.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    lib.ct_chol_counts.restype = ctypes.c_int64
    lib.ct_chol_counts.argtypes = [ctypes.c_int32, i64p, i32p, i32p, i64p]
    lib.ct_chol_symbolic.restype = ctypes.c_int64
    lib.ct_chol_symbolic.argtypes = [ctypes.c_int32, i64p, i32p, i64p, i32p]
    lib.ct_chol_numeric.restype = ctypes.c_int32
    lib.ct_chol_numeric.argtypes = [
        ctypes.c_int32, i64p, i32p, f64p, i64p, i32p, i32p, f64p,
    ]
    lib.ct_chol_solve.restype = ctypes.c_int32
    lib.ct_chol_solve.argtypes = [ctypes.c_int32, i64p, i32p, f64p, f64p]
    lib.ct_chol_solve_multi.restype = ctypes.c_int32
    lib.ct_chol_solve_multi.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, f64p, f64p,
    ]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ct_chol_numeric_f32.restype = ctypes.c_int32
    lib.ct_chol_numeric_f32.argtypes = [
        ctypes.c_int32, i64p, i32p, f64p, i64p, i32p, i32p, f32p,
    ]
    lib.ct_chol_solve_f32.restype = ctypes.c_int32
    lib.ct_chol_solve_f32.argtypes = [ctypes.c_int32, i64p, i32p, f32p, f64p]
    lib.ct_csr_matvec.restype = ctypes.c_int32
    lib.ct_csr_matvec.argtypes = [ctypes.c_int32, i64p, i32p, f64p, f64p, f64p]
    _lib = lib
    return lib


class SparseCholesky:
    """Cached-symbolic sparse Cholesky (sparse_cholesky.h:73-112 interface:
    Factorize-with-reused-symbolic + Solve).

    Input: full symmetric CSR. Fill-reducing permutations (quotient-graph
    minimum degree and RCM) are analyzed once and the lower-fill one kept;
    numeric refactorization reuses the symbolic analysis.
    """

    def __init__(self, n, indptr, indices, use_ordering: bool = True):
        lib = get_lib()
        self.n = int(n)
        indptr = np.ascontiguousarray(indptr, np.int64)
        indices = np.ascontiguousarray(indices, np.int32)
        candidates = []
        if use_ordering and self.n > 1:
            fns = [lib.ct_mindeg]
            if self.n > 1000:
                fns.append(lib.ct_nd)  # wins on grid-like patterns
            if self.n <= 50_000:
                fns.append(lib.ct_rcm)  # covers MD pathologies; O(n) scan
            for fn in fns:
                perm = np.zeros(self.n, np.int32)
                fn(self.n, indptr, indices, perm)
                candidates.append(perm)
        else:
            candidates.append(np.arange(self.n, dtype=np.int32))
        # Rank candidates by EXACT fill via O(|A| alpha) column counts
        # (ct_chol_counts — never pays a bad candidate's O(nnzL) symbolic),
        # then run the full symbolic analysis once, on the winner.
        best = None
        for perm in candidates:
            if len(candidates) == 1:
                best = (perm, 0)
                break
            pp, pi, _ = self._permuted_pattern(perm, indptr, indices)
            par = np.zeros(self.n, np.int32)
            cc = np.zeros(self.n, np.int64)
            nnzL = int(lib.ct_chol_counts(self.n, pp, pi, par, cc))
            if best is None or nnzL < best[1]:
                best = (perm, nnzL)
        (self.perm, self.iperm, self.pindptr, self.pindices, self.value_perm,
         self.Lp, self.parent, self.nnzL) = (
            (best[0],) + self._symbolic(lib, best[0], indptr, indices))
        self.Li = np.zeros(self.nnzL, np.int32)
        self.Lx = np.zeros(self.nnzL, np.float64)
        self._lib = lib

    def _permuted_pattern(self, perm, indptr, indices):
        """Permuted pattern (A'[iperm[i], iperm[j]] = A[i, j]); returns
        (pindptr, pindices, value_perm)."""
        import scipy.sparse as sp

        iperm = np.argsort(perm).astype(np.int32)
        nnz = indices.shape[0]
        # 1-based positions so scipy cannot prune the entry at position 0.
        A = sp.csr_matrix(
            (np.arange(1, nnz + 1, dtype=np.int64), indices, indptr),
            shape=(self.n, self.n),
        )
        P = sp.csr_matrix(
            (np.ones(self.n), (iperm, np.arange(self.n))), shape=(self.n, self.n)
        )
        Ap_perm = (P @ A @ P.T).tocsr()
        Ap_perm.sort_indices()
        pindptr = np.ascontiguousarray(Ap_perm.indptr, np.int64)
        pindices = np.ascontiguousarray(Ap_perm.indices, np.int32)
        # value permutation: position k in permuted values = original position
        value_perm = np.ascontiguousarray(Ap_perm.data, np.int64) - 1
        return pindptr, pindices, value_perm

    def _symbolic(self, lib, perm, indptr, indices):
        """Permute the pattern and run the full symbolic factorization.
        Returns the per-ordering state tuple."""
        iperm = np.argsort(perm).astype(np.int32)
        pindptr, pindices, value_perm = self._permuted_pattern(
            perm, indptr, indices)
        Lp = np.zeros(self.n + 1, np.int64)
        parent = np.zeros(self.n, np.int32)
        nnzL = int(lib.ct_chol_symbolic(self.n, pindptr, pindices, Lp, parent))
        return (iperm, pindptr, pindices, value_perm, Lp, parent, nnzL)

    def factorize(self, values) -> bool:
        """Numeric factorization; returns False if not positive definite."""
        pv = np.ascontiguousarray(np.asarray(values, np.float64)[self.value_perm])
        ret = self._lib.ct_chol_numeric(
            self.n, self.pindptr, self.pindices, pv, self.Lp, self.parent,
            self.Li, self.Lx,
        )
        return ret == 0

    def solve(self, b) -> np.ndarray:
        x = np.ascontiguousarray(np.asarray(b, np.float64)[self.perm])
        self._lib.ct_chol_solve(self.n, self.Lp, self.Li, self.Lx, x)
        return x[self.iperm]

    def solve_multi(self, B) -> np.ndarray:
        """Solve for columns of B (n, m)."""
        Bp = np.asfortranarray(np.asarray(B, np.float64)[self.perm, :])
        flat = np.ascontiguousarray(Bp.T.reshape(-1))
        self._lib.ct_chol_solve_multi(
            self.n, B.shape[1], self.Lp, self.Li, self.Lx, flat
        )
        out = flat.reshape(B.shape[1], self.n).T
        return out[self.iperm, :]


class RefinedSparseCholesky:
    """Mixed-precision sparse direct solve: fp32 factorization + fp64
    iterative refinement — the reference's RefinedSparseCholesky +
    SparseIterativeRefiner (sparse_cholesky.cc factory float variants,
    iterative_refiner.h:61-94)."""

    def __init__(self, n, indptr, indices, max_num_refinement_iterations: int = 3,
                 use_ordering: bool = True):
        self.base = SparseCholesky(n, indptr, indices, use_ordering)
        self.max_iters = max_num_refinement_iterations
        self.Lx32 = np.zeros(self.base.nnzL, np.float32)
        # keep the (permuted) fp64 matrix values for residual computation
        self._pvals = None

    def factorize(self, values) -> bool:
        b = self.base
        pv = np.ascontiguousarray(np.asarray(values, np.float64)[b.value_perm])
        self._pvals = pv
        ret = b._lib.ct_chol_numeric_f32(
            b.n, b.pindptr, b.pindices, pv, b.Lp, b.parent, b.Li, self.Lx32
        )
        return ret == 0

    def solve(self, rhs) -> np.ndarray:
        b = self.base
        bp = np.ascontiguousarray(np.asarray(rhs, np.float64)[b.perm])
        x = bp.copy()
        b._lib.ct_chol_solve_f32(b.n, b.Lp, b.Li, self.Lx32, x)
        tmp = np.zeros_like(x)
        for _ in range(self.max_iters):
            b._lib.ct_csr_matvec(b.n, b.pindptr, b.pindices, self._pvals, x, tmp)
            resid = bp - tmp
            corr = resid.copy()
            b._lib.ct_chol_solve_f32(b.n, b.Lp, b.Li, self.Lx32, corr)
            x = x + corr
        return x[b.iperm]
