"""SPARSE_NORMAL_CHOLESKY: J'J via the inner-product computer + native
sparse Cholesky.

TPU-native split of /root/reference/internal/ceres/
sparse_normal_cholesky_solver.cc:58: the numeric product J'J and the RHS
J'r are one fused device pass (ops/inner_product.py); the simplicial
factorization runs in the native C++ backend (ceres_tpu/native) with the
symbolic analysis cached across iterations — the same division of labor as
the reference's CPU CHOLMOD path. DYNAMIC sparsity
(dynamic_sparse_normal_cholesky_solver.cc:48: the Jacobian's NUMERIC
sparsity may change between iterations, so symbolic analysis is redone
every solve) prunes numerically-zero entries from the block pattern of
J'J and builds a fresh factorization — ordering + elimination tree +
numeric — per call.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops import bsr
from ...ops.inner_product import InnerProductComputer
from ...types import LinearSolverTerminationType


class SparseNormalCholeskySolver:
    def __init__(self, meta: bsr.BlockJacobianMeta,
                 use_mixed_precision: bool = False,
                 max_num_refinement_iterations: int = 3,
                 dynamic: bool = False):
        self.meta = meta
        self.ipc = InnerProductComputer(meta)
        self.mixed = use_mixed_precision
        self.refine = max(1, max_num_refinement_iterations)
        self.dynamic = dynamic
        self.chol = None if dynamic else self._make_backend(
            self.ipc.indptr, self.ipc.indices)

    def _make_backend(self, indptr, indices):
        if self.mixed:
            from ...native import RefinedSparseCholesky

            return RefinedSparseCholesky(
                self.ipc.n, indptr, indices,
                max_num_refinement_iterations=self.refine,
            )
        from ...native import SparseCholesky

        return SparseCholesky(self.ipc.n, indptr, indices)

    def _dynamic_backend(self, vals):
        """Per-solve symbolic analysis on the PRUNED numeric pattern
        (Options::dynamic_sparsity;
        dynamic_sparse_normal_cholesky_solver.cc re-runs Analyze +
        Factorize each call). Diagonal entries always survive so the
        pattern stays factorizable — compute() folds D^2 onto them."""
        indptr = np.asarray(self.ipc.indptr)
        indices = np.asarray(self.ipc.indices)
        keep = vals != 0.0
        rows = np.repeat(np.arange(self.ipc.n), np.diff(indptr))
        keep |= indices == rows
        new_indptr = np.concatenate(
            [[0], np.cumsum(np.add.reduceat(keep, indptr[:-1]))]
        ).astype(indptr.dtype)
        return self._make_backend(new_indptr, indices[keep]), vals[keep]

    def solve(self, values, residuals, D):
        """min ||J y - r||^2 + ||D y||^2; returns (y, termination)."""
        vals = np.asarray(self.ipc.compute(values, D))
        rhs = np.asarray(bsr.left_multiply(self.meta, values, residuals))
        chol = self.chol
        if self.dynamic:
            chol, vals = self._dynamic_backend(vals)
        if not chol.factorize(vals):
            return None, LinearSolverTerminationType.FAILURE
        y = chol.solve(rhs)
        if not np.all(np.isfinite(y)):
            return None, LinearSolverTerminationType.FAILURE
        return jnp.asarray(y), LinearSolverTerminationType.SUCCESS
