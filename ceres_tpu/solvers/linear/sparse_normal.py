"""SPARSE_NORMAL_CHOLESKY: J'J via the inner-product computer + native
sparse Cholesky.

TPU-native split of /root/reference/internal/ceres/
sparse_normal_cholesky_solver.cc:58: the numeric product J'J and the RHS
J'r are one fused device pass (ops/inner_product.py); the simplicial
factorization runs in the native C++ backend (ceres_tpu/native) with the
symbolic analysis cached across iterations — the same division of labor as
the reference's CPU CHOLMOD path. DYNAMIC sparsity (re-analyze every
iteration, dynamic_sparse_normal_cholesky_solver.cc) falls out by
rebuilding the computer per solve.
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
                 max_num_refinement_iterations: int = 3):
        self.meta = meta
        self.ipc = InnerProductComputer(meta)
        if use_mixed_precision:
            from ...native import RefinedSparseCholesky

            self.chol = RefinedSparseCholesky(
                self.ipc.n, self.ipc.indptr, self.ipc.indices,
                max_num_refinement_iterations=max(1, max_num_refinement_iterations),
            )
        else:
            from ...native import SparseCholesky

            self.chol = SparseCholesky(self.ipc.n, self.ipc.indptr, self.ipc.indices)

    def solve(self, values, residuals, D):
        """min ||J y - r||^2 + ||D y||^2; returns (y, termination)."""
        vals = np.asarray(self.ipc.compute(values, D))
        rhs = np.asarray(bsr.left_multiply(self.meta, values, residuals))
        if not self.chol.factorize(vals):
            return None, LinearSolverTerminationType.FAILURE
        y = self.chol.solve(rhs)
        if not np.all(np.isfinite(y)):
            return None, LinearSolverTerminationType.FAILURE
        return jnp.asarray(y), LinearSolverTerminationType.SUCCESS
