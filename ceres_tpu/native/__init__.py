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


def _ensure_built(src: pathlib.Path, so: pathlib.Path):
    """Build `so` from `src` unless an up-to-date binary exists. The
    trigger is a CONTENT HASH of the source (sidecar .hash file), not an
    mtime comparison — git does not preserve mtimes, so after a fresh
    checkout mtime ordering is arbitrary and could dlopen a stale or
    wrong-arch binary."""
    import hashlib

    h = hashlib.sha256(src.read_bytes()).hexdigest()
    hpath = so.with_suffix(".hash")
    if so.exists() and hpath.exists() and hpath.read_text().strip() == h:
        return
    # -march=native: the .so is always (re)built from source on the host
    # that runs it (content-hash trigger above), so native ISA (AVX2/FMA/
    # AVX-512 where present) is safe and ~2x on the supernodal GEMM panels
    subprocess.run(
        ["g++", "-O3", "-march=native", "-funroll-loops", "-fPIC",
         "-shared", "-std=c++17", str(src), "-o", str(so)],
        check=True, capture_output=True,
    )
    hpath.write_text(h)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    _ensure_built(_SRC, _SO)
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
    lib.ct_permute_pattern.restype = ctypes.c_int32
    lib.ct_permute_pattern.argtypes = [
        ctypes.c_int32, i64p, i32p, i32p, i64p, i32p, i64p,
    ]
    lib.ct_compress.restype = ctypes.c_int32
    lib.ct_compress.argtypes = [ctypes.c_int32, i64p, i32p, i32p, i64p, i32p]
    lib.ct_chol_numeric.restype = ctypes.c_int32
    lib.ct_chol_numeric.argtypes = [
        ctypes.c_int32, i64p, i32p, f64p, i64p, i32p, i32p, f64p,
    ]
    lib.ct_etree_postorder.restype = ctypes.c_int32
    lib.ct_etree_postorder.argtypes = [ctypes.c_int32, i64p, i32p, i32p]
    lib.ct_super_analyze.restype = ctypes.c_void_p
    lib.ct_super_analyze.argtypes = [
        ctypes.c_int32, i64p, i32p, ctypes.c_int32, ctypes.c_double,
        i64p, i32p,
    ]
    lib.ct_super_free.restype = None
    lib.ct_super_free.argtypes = [ctypes.c_void_p]
    lib.ct_super_nsn.restype = ctypes.c_int64
    lib.ct_super_nsn.argtypes = [ctypes.c_void_p]
    lib.ct_super_factor.restype = ctypes.c_int32
    lib.ct_super_factor.argtypes = [
        ctypes.c_void_p, i64p, i32p, f64p, i32p, f64p,
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
    lib.ct_super_factor_f32.restype = ctypes.c_int32
    lib.ct_super_factor_f32.argtypes = [
        ctypes.c_void_p, i64p, i32p, f64p, i32p, f32p,
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
        if use_ordering and self.n > 1:
            # Supervariable (indistinguishable-node) compression: columns
            # with identical closed adjacency collapse into one quotient
            # node, so the orderings run on the ~t-times-smaller block
            # graph (CHOLMOD's supernodal-analysis role,
            # suitesparse.cc:619). Hash collisions merely merge
            # non-identical nodes — the expanded permutation is always
            # valid and the full symbolic runs on the TRUE scalar pattern,
            # so compression can only affect fill quality, never
            # correctness.
            gof, qptr, qidx, gsize = _compress_supervariables(
                self.n, indptr, indices)
            nq = int(gsize.shape[0])
            if nq > 0.85 * self.n:
                # Not meaningfully compressible (e.g. scalar grid/mesh
                # patterns): order the original graph directly — quotient
                # relabeling would only perturb tie-breaking quality.
                gof = np.arange(self.n, dtype=np.int32)
                qptr, qidx = indptr, indices
                gsize = np.ones(self.n, np.int64)
                nq = self.n
            fns = [lib.ct_mindeg]
            if nq > 1000:
                fns.append(lib.ct_nd)  # wins on grid-like patterns
            if nq <= 50_000:
                fns.append(lib.ct_rcm)  # covers MD pathologies; O(n) scan
            candidates = []
            for fn in fns:
                bperm = np.zeros(nq, np.int32)
                fn(nq, qptr, qidx, bperm)
                candidates.append(bperm)
            # Rank candidates on the QUOTIENT graph by weighted column
            # counts (ct_chol_counts cc output x node weights — exact for
            # uniform block sizes, a fill proxy otherwise), then expand
            # the winner and run the full scalar symbolic once.
            best = None
            for bperm in candidates:
                if len(candidates) == 1:
                    best = (bperm, 0)
                    break
                biperm = np.argsort(bperm).astype(np.int32)
                qnnz = qidx.shape[0]
                bp = np.zeros(nq + 1, np.int64)
                bi = np.zeros(qnnz, np.int32)
                vp = np.zeros(qnnz, np.int64)
                lib.ct_permute_pattern(nq, qptr, qidx, biperm, bp, bi, vp)
                par = np.zeros(nq, np.int32)
                cc = np.zeros(nq, np.int64)
                lib.ct_chol_counts(nq, bp, bi, par, cc)
                score = int(np.sum(cc * gsize[bperm].astype(np.int64)))
                if best is None or score < best[1]:
                    best = (bperm, score)
            # expand: scalar columns sorted by (block position, column id)
            block_pos = np.zeros(nq, np.int64)
            block_pos[best[0]] = np.arange(nq)
            perm = np.lexsort(
                (np.arange(self.n), block_pos[gof])).astype(np.int32)
        else:
            perm = np.arange(self.n, dtype=np.int32)
        (self.perm, self.iperm, self.pindptr, self.pindices, self.value_perm,
         self.Lp, self.parent, self.nnzL) = self._symbolic(
            lib, perm, indptr, indices)
        self.Li = np.zeros(self.nnzL, np.int32)
        self.Lx = np.zeros(self.nnzL, np.float64)
        self._lib = lib

    def _permuted_pattern(self, perm, indptr, indices):
        """Permuted pattern (A'[iperm[i], iperm[j]] = A[i, j]) via the
        native kernel; returns (pindptr, pindices, value_perm)."""
        lib = get_lib()
        iperm = np.argsort(perm).astype(np.int32)
        nnz = indices.shape[0]
        pindptr = np.zeros(self.n + 1, np.int64)
        pindices = np.zeros(nnz, np.int32)
        value_perm = np.zeros(nnz, np.int64)
        lib.ct_permute_pattern(self.n, indptr, indices, iperm, pindptr,
                               pindices, value_perm)
        return pindptr, pindices, value_perm

    def _symbolic(self, lib, perm, indptr, indices):
        """Permute the pattern and run the SUPERNODAL symbolic analysis
        (ct_super_analyze: etree + counts + fundamental supernodes +
        relaxed amalgamation — the CHOLMOD supernodal-analysis role).
        Lp is the PADDED column-pointer array (explicit zeros where
        amalgamation widened a column's pattern); every downstream solve
        kernel consumes the padded CSC unchanged. Falls back to the
        simplicial symbolic when analysis fails."""
        pindptr, pindices, _ = self._permuted_pattern(
            perm, indptr, indices)
        # fill-preserving etree POSTORDER composed into the ordering:
        # subtrees become contiguous, so fundamental supernodes and the
        # relaxed amalgamation see parent-adjacent chains
        post = np.zeros(self.n, np.int32)
        if lib.ct_etree_postorder(self.n, pindptr, pindices, post) == 0:
            perm = perm[post]
        iperm = np.argsort(perm).astype(np.int32)
        pindptr, pindices, value_perm = self._permuted_pattern(
            perm, indptr, indices)
        Lp = np.zeros(self.n + 1, np.int64)
        parent = np.zeros(self.n, np.int32)
        # Tier policy (CHOLMOD's simplicial/supernodal auto-select,
        # cholmod_analyze): thin factors (few nnzL per column) are
        # overhead-bound — the scalar up-looking kernel wins and relaxed
        # amalgamation would only add padding flops; dense fronts go
        # supernodal (measured 4.1x on 30%-loop-closure pose graphs).
        cc = np.zeros(self.n, np.int64)
        lib.ct_chol_counts(self.n, pindptr, pindices, parent, cc)
        density = float(cc.sum()) / max(self.n, 1)
        self._use_super = density >= 30.0
        relax = 0.2 if self._use_super else 0.0
        self._handle = lib.ct_super_analyze(
            self.n, pindptr, pindices, 32, relax, Lp, parent)
        if not self._handle:  # pragma: no cover - analyze cannot fail
            nnzL = int(lib.ct_chol_symbolic(
                self.n, pindptr, pindices, Lp, parent))
        else:
            nnzL = int(Lp[self.n])
        return (perm, iperm, pindptr, pindices, value_perm, Lp, parent,
                nnzL)

    def __del__(self):
        h = getattr(self, "_handle", None)
        if h:
            try:
                self._lib.ct_super_free(h)
            except Exception:
                pass

    def factorize(self, values) -> bool:
        """Numeric factorization; returns False if not positive definite.

        SUPERNODAL left-looking kernel first (ct_chol_super — the
        CHOLMOD-supernodal role, suitesparse.cc; dense panel updates,
        ~5-10x the scalar up-looking kernel on SLAM-scale block
        matrices); the simplicial kernel is the fallback for patterns
        whose fundamental-supernode symbolic disagrees (-1000000)."""
        pv = np.ascontiguousarray(np.asarray(values, np.float64)[self.value_perm])
        if self._handle and self._use_super:
            ret = self._lib.ct_super_factor(
                self._handle, self.pindptr, self.pindices, pv,
                self.Li, self.Lx,
            )
        else:
            # thin-factor tier: relax=0 above means Lp is unpadded, so
            # the simplicial kernel fills every slot
            ret = self._lib.ct_chol_numeric(
                self.n, self.pindptr, self.pindices, pv, self.Lp,
                self.parent, self.Li, self.Lx,
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
        if b._handle and b._use_super:
            ret = b._lib.ct_super_factor_f32(
                b._handle, b.pindptr, b.pindices, pv, b.Li, self.Lx32
            )
        else:
            ret = b._lib.ct_chol_numeric_f32(
                b.n, b.pindptr, b.pindices, pv, b.Lp, b.parent, b.Li,
                self.Lx32
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


# ---------------------------------------------------------------------------
# Sparse QR (George-Heath row-Givens) — Covariance SPARSE_QR backend
# (covariance_impl.cc:539's SuiteSparseQR role).
# ---------------------------------------------------------------------------

_SRC_QR = _DIR / "sparse_qr.cc"
_SO_QR = _DIR / "_sparse_qr.so"
_qr_lib = None


def get_qr_lib():
    global _qr_lib
    if _qr_lib is not None:
        return _qr_lib
    _ensure_built(_SRC_QR, _SO_QR)
    lib = ctypes.CDLL(str(_SO_QR))
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ct_qr_factor.restype = ctypes.c_int64
    lib.ct_qr_factor.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, f64p,
    ]
    lib.ct_qr_factor_split.restype = ctypes.c_int64
    lib.ct_qr_factor_split.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i64p, i32p, f64p, ctypes.c_int32,
    ]
    lib.ct_qr_set_dense.restype = None
    lib.ct_qr_set_dense.argtypes = [f64p]
    lib.ct_qr_diag.restype = None
    lib.ct_qr_diag.argtypes = [f64p]
    lib.ct_qr_solve_multi.restype = ctypes.c_int32
    lib.ct_qr_solve_multi.argtypes = [ctypes.c_int32, f64p, f64p]
    lib.ct_qr_free.restype = None
    lib.ct_qr_free.argtypes = []
    _qr_lib = lib
    return lib


class SparseQR:
    """R-only sparse QR of a CSR matrix via row-Givens with sparse R rows.

    The factorization lives in module-global C++ state: exactly ONE
    SparseQR may be live at a time (single-threaded host use — same
    discipline as the reference's global vendor-library handles). Creating
    a new instance invalidates the previous one.
    """

    _live = None

    def __init__(self, nrows, ncols, indptr, indices, data,
                 schur_tail_split: "int | None" = None):
        """schur_tail_split: factor only columns [0, split) by row-Givens
        and DISCARD remainders reaching [split, ncols) — the caller must
        install R_cc = chol(S)' via set_dense before diag()/solves
        (the TPU-offloaded dense-tail mode, sparse_qr.cc notes)."""
        lib = get_qr_lib()
        self._lib = lib
        self.ncols = int(ncols)
        if schur_tail_split is None:
            nnz = lib.ct_qr_factor(
                int(nrows), int(ncols),
                np.ascontiguousarray(indptr, np.int64),
                np.ascontiguousarray(indices, np.int32),
                np.ascontiguousarray(data, np.float64),
            )
        else:
            nnz = lib.ct_qr_factor_split(
                int(nrows), int(ncols),
                np.ascontiguousarray(indptr, np.int64),
                np.ascontiguousarray(indices, np.int32),
                np.ascontiguousarray(data, np.float64),
                int(schur_tail_split),
            )
        self.nnz_R = int(nnz)
        SparseQR._live = self

    def set_dense(self, Rcc: np.ndarray):
        """Install the (m, m) row-major upper-triangular trailing block."""
        assert SparseQR._live is self, "another SparseQR replaced this one"
        self._lib.ct_qr_set_dense(
            np.ascontiguousarray(Rcc, np.float64))

    def diag(self) -> np.ndarray:
        """|diag(R)|; 0.0 marks a structurally empty (rank-deficient) row."""
        assert SparseQR._live is self, "another SparseQR replaced this one"
        d = np.zeros(self.ncols, np.float64)
        self._lib.ct_qr_diag(d)
        return d

    def solve_normal_multi(self, B) -> np.ndarray:
        """(A'A)^{-1} B = R^{-1} R^{-T} B for (ncols, k) B."""
        assert SparseQR._live is self, "another SparseQR replaced this one"
        B = np.ascontiguousarray(B, np.float64)
        X = np.zeros_like(B)
        ret = self._lib.ct_qr_solve_multi(B.shape[1], B, X)
        if ret != 0:
            raise np.linalg.LinAlgError("rank-deficient R in sparse QR")
        return X

    def free(self):
        if SparseQR._live is self:
            self._lib.ct_qr_free()
            SparseQR._live = None


def _compress_supervariables(n, indptr, indices):
    """Group columns with identical closed adjacency (supervariables) and
    build the quotient graph (native ct_compress). Hash-based: collisions
    only merge extra nodes, which is SAFE (see SparseCholesky.__init__).
    Returns (group_of (n,), qptr, qidx, gsize)."""
    lib = get_lib()
    nnz = indices.shape[0]
    gof = np.zeros(n, np.int32)
    qptr_full = np.zeros(n + 1, np.int64)
    qidx_full = np.zeros(max(nnz, 1), np.int32)
    nq = int(lib.ct_compress(n, indptr, indices, gof, qptr_full, qidx_full))
    qptr = np.ascontiguousarray(qptr_full[: nq + 1])
    qnnz = int(qptr[nq])
    qidx = np.ascontiguousarray(qidx_full[:qnnz])
    gsize = np.bincount(gof, minlength=nq).astype(np.int64)
    return gof, qptr, qidx, gsize
