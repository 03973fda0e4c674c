"""Covariance estimation: blocks of (J'J)^{-1} after a solve.

TPU-native equivalent of /root/reference/include/ceres/covariance.h:202 and
internal/ceres/covariance_impl.cc (ComputeCovarianceSparsity :364,
ComputeCovarianceValues :504). Algorithms:

 - DENSE_SVD: rank-deficiency-tolerant Moore-Penrose pseudo-inverse with
   min_reciprocal_condition_number / null_space_rank semantics
   (covariance_impl.cc DENSE_SVD branch);
 - SPARSE_QR: a true QR of J itself (covariance_impl.cc:539's
   SuiteSparseQR/Eigen-SparseQR role): R is accumulated row-by-row from
   the sparse CSR rows of J with Givens rotations (George & Heath 1980,
   the classic sparse row-QR), so conditioning is that of J — NOT of
   J'J. (J'J)^{-1} = R^{-1}R^{-T} then comes from two triangular solves
   per requested column. J is never densified; R is held dense (T x T —
   the same footprint as the answer itself).
 - use_normal_equations=True (repo extension): the previous fast path —
   Cholesky of J'J via the native backend. Half the usable digits on
   ill-conditioned problems (it squares the condition number); fine and
   much faster when cond(J) is modest.

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
    # Repo extension: solve (J'J)^{-1} from a Cholesky of J'J instead of a
    # QR of J. Much faster, but squares the condition number — use only
    # when cond(J) is comfortably below ~1e7.
    use_normal_equations: bool = False
    # Repo extension (SPARSE_QR): when the problem has an eligible Schur
    # e/f partition whose camera core is at least this wide, the dense
    # trailing block of R comes from chol(S) assembled on the
    # accelerator (R_cc'R_cc == S exactly) instead of host row-Givens —
    # the flop-bound term of full-BA covariance
    # (covariance_impl.cc:539's threaded-QR role). The camera core is
    # formed as a Schur complement, so its conditioning is that of S
    # (like every Schur-based solver); set <= 0 to disable and take the
    # pure row-Givens QR.
    schur_tail_min_cols: int = 512


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
        T = prog.tangent_size
        o = self.options
        if o.algorithm_type == CovarianceAlgorithmType.DENSE_SVD:
            _, _, _, J = prog.evaluate_dense(x)
            J = np.asarray(J)
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
            ok = self._compute_sparse(prog, x, covariance_blocks)
            if not ok:
                return False
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

    def _compute_sparse(self, prog, x, covariance_blocks) -> bool:
        """SPARSE_QR: factor J = QR and solve the requested columns of
        (J'J)^{-1} = R^{-1}R^{-T} by two triangular solves. With
        use_normal_equations, substitute the native sparse Cholesky of
        J'J (fast path; squares the condition number)."""
        T = prog.tangent_size
        out = prog._eval_core(x, True, False)
        if self.options.use_normal_equations:
            solve_cols = self._normal_equation_solver(prog, out)
        else:
            solve_cols = self._qr_solver(prog, out)
        if solve_cols is None:
            return False
        # Columns to solve: union of blocks named in covariance_blocks
        # (symmetry covers (i, j) vs (j, i)); everything if none given.
        offsets = {}
        off = 0
        for fam in prog.families:
            for i, b in enumerate(fam.blocks[: fam.num_var]):
                offsets[id(b)] = (fam.tangent_offset + i * fam.tsize, fam.tsize)
        cols: List[int] = []
        if covariance_blocks:
            seen = set()
            for pair in covariance_blocks:
                for v in pair:
                    blk = prog.problem.parameter_block_for(v)
                    info = offsets.get(id(blk))
                    if info is None:
                        continue  # constant block
                    if info[0] not in seen:
                        seen.add(info[0])
                        cols.extend(range(info[0], info[0] + info[1]))
            cols = sorted(cols)
        else:
            cols = list(range(T))
        E = np.zeros((T, len(cols)))
        E[cols, np.arange(len(cols))] = 1.0
        try:
            sol = solve_cols(E)  # (T, k) = (J'J)^{-1} columns
        finally:
            # release the native factor (module-global C++ state for the
            # QR path: a later Covariance.compute would invalidate it
            # anyway, and the R factor can be large)
            close = getattr(solve_cols, "close", None)
            if close is not None:
                close()
        if len(cols) == T:
            self._cov = sol
        else:
            self._cov = None
            self._cov_cols = sol
            self._colmap = {c: k for k, c in enumerate(cols)}
        return True

    def _normal_equation_solver(self, prog, out):
        """Cholesky-of-J'J column solver (fast path). Returns
        solve(E) -> (T, k), or None on rank deficiency."""
        from .native import SparseCholesky
        from .ops import bsr
        from .ops.inner_product import InnerProductComputer

        meta = bsr.build_meta(prog)
        ipc = InnerProductComputer(meta)
        vals = np.asarray(ipc.compute(out["block_jacs"]))
        chol = SparseCholesky(ipc.n, ipc.indptr, ipc.indices)
        if not chol.factorize(vals):
            return None  # rank deficient: reference returns failure
        dl = np.abs(chol.Lx[chol.Lp[:-1]])
        d2 = dl * dl  # pivots of J'J (~ squared diag of R)
        if d2.size and d2.min() <= (
            self.options.min_reciprocal_condition_number * d2.max()
        ):
            return None
        return chol.solve_multi

    def _qr_solver(self, prog, out):
        """True sparse QR of J (George & Heath row-Givens): accumulate the
        T x T upper-triangular R from CSR rows of J, never forming Q or a
        dense J. Conditioning is cond(J), not cond(J'J) — the property
        covariance exists to exploit (covariance_impl.cc:539). Factoring
        runs in the native backend (native/sparse_qr.cc) with sparse R
        rows after an AMD fill-reducing column pre-ordering on the A'A
        pattern (SuiteSparseQR's COLAMD role). Returns
        solve(E) -> R^{-1} R^{-T} E, or None on rank deficiency."""
        from .native import SparseQR, get_lib
        from .ops import bsr

        T = prog.tangent_size
        meta = bsr.build_meta(prog)

        # Vectorized triplet assembly of J's CSR rows (sentinel col == T
        # marks a constant block: dropped). Row order is irrelevant to R.
        trip_r, trip_c, trip_v = [], [], []
        pat_enc = []  # encoded (i, j) pairs for the A'A pattern
        for kind, jacs in zip(meta.kinds, out["block_jacs"]):
            cols = np.concatenate(
                [np.asarray(meta.arrays[s.tangent_idx_key]) for s in kind.slots],
                axis=1,
            )  # (B, m)
            data = np.concatenate(
                [np.asarray(J, dtype=np.float64) for J in jacs], axis=2
            )  # (B, r, m)
            B, r, m = data.shape
            rowids = (kind.row_offset + np.arange(B * r)).reshape(B, r)
            rr = np.broadcast_to(rowids[:, :, None], (B, r, m))
            cc = np.broadcast_to(cols[:, None, :], (B, r, m))
            keep = cc < T
            trip_r.append(rr[keep])
            trip_c.append(cc[keep])
            trip_v.append(data[keep])
            ii = np.broadcast_to(cols[:, :, None], (B, m, m))
            jj = np.broadcast_to(cols[:, None, :], (B, m, m))
            kp = (ii < T) & (jj < T)
            pat_enc.append(ii[kp].astype(np.int64) * T + jj[kp])
        if not trip_r:
            return None
        rows = np.concatenate(trip_r)
        colsA = np.concatenate(trip_c).astype(np.int64)
        vals = np.concatenate(trip_v)

        # Schur-tail fast path (VERDICT r3 #8 / covariance_impl.cc:539's
        # threaded-SuiteSparseQR role, TPU-offloaded): when the problem
        # has an eligible e/f partition with a LARGE camera core, the
        # dense trailing block of R is determined analytically by
        # R_cc'R_cc = S (the camera Schur complement) — computed by the
        # device Schur assembly — while the native phase factors only the
        # cheap point columns. The host row-Givens on the 9C-wide core
        # (the flop-bound ~1e13 term at 1k cameras) disappears.
        st = self._schur_tail_solver(prog, out, rows, colsA, vals, T)
        if st is not None:
            return st

        # AMD ordering on the A'A pattern (quotient-graph min degree from
        # the native Cholesky backend), QR's fill-reducing pre-permutation
        # (reorder_program.cc ReorderProgramForSparseCholesky role).
        perm = np.arange(T, dtype=np.int32)
        if T > 2:
            enc = np.unique(np.concatenate(pat_enc))
            pi = (enc // T).astype(np.int32)
            pj = (enc % T).astype(np.int32)
            indptr_p = np.zeros(T + 1, np.int64)
            np.cumsum(np.bincount(pi, minlength=T), out=indptr_p[1:])
            get_lib().ct_mindeg(
                T, indptr_p, np.ascontiguousarray(pj), perm)
        iperm = np.argsort(perm).astype(np.int64)  # old col -> new col

        newc = iperm[colsA]
        order = np.lexsort((newc, rows))
        rows_s, cols_s, vals_s = rows[order], newc[order], vals[order]
        nrows = int(prog.num_residuals)
        indptr = np.zeros(nrows + 1, np.int64)
        np.cumsum(np.bincount(rows_s, minlength=nrows), out=indptr[1:])

        qr = SparseQR(nrows, T, indptr, cols_s.astype(np.int32), vals_s)
        d = qr.diag()
        d2 = d * d
        if (d2.min() if d2.size else 0.0) <= (
            self.options.min_reciprocal_condition_number
            * (d2.max() if d2.size else 1.0)
        ):
            qr.free()
            return None  # rank deficient (qr rank < num_cols -> failure)

        def solve(E):
            Ep = np.asarray(E, np.float64)[perm, :]
            Xp = qr.solve_normal_multi(Ep)
            return Xp[iperm, :]

        solve.close = qr.free
        return solve

    def _schur_tail_solver(self, prog, out, rows, colsA, vals, T):
        """Hybrid sparse-QR: native row-Givens on the e (point) columns +
        R_cc = chol(S)' from the Schur complement assembled on the
        accelerator. Exact: with columns ordered [e | f],
        R_ec = R_ee^{-T} H_ec, so H_ce H_ee^{-1} H_ec = R_ce R_ec and
        R_cc'R_cc = H_cc - H_ce H_ee^{-1} H_ec = S identically. Returns
        a solve closure or None when the structure doesn't qualify."""
        import jax.numpy as jnp

        from .native import SparseQR
        from .ops import bsr, partition as pt_mod
        from .ops import flatops as fo_mod
        from .utils import ordering as om

        min_core = self.options.schur_tail_min_cols
        if min_core <= 0:
            return None
        try:
            e_sets = om.eligible_e_sets(prog)
            if not e_sets:
                return None
            meta = bsr.build_meta(prog)
            pm = pt_mod.build_partition(meta, e_sets)
            if pm.f_size < min_core or pm.e_size == 0:
                return None
            if pm.e_size + pm.f_size != T:
                return None
            fl = fo_mod.FlatSchurOps(pm)
            if not fl.supported:
                return None
            from .options import Options
            from .solvers.fused_lm import DenseSchurStepOps
            from .types import LinearSolverType

            ops = DenseSchurStepOps(
                prog, Options(linear_solver_type=LinearSolverType.DENSE_SCHUR),
                e_sets)
        except (ValueError, KeyError):
            return None

        # column order [e | f] from the partition's family spans
        e_cols = [
            np.arange(pm.base.families[fi].tangent_offset,
                      pm.base.families[fi].tangent_offset + nv * t)
            for fi, (off, nv, t, _) in zip(pm.e_family_indices, pm.e_fams)
        ]
        f_cols = [
            np.arange(pm.base.families[fi].tangent_offset,
                      pm.base.families[fi].tangent_offset + nv * t)
            for fi, (off, nv, t, _) in zip(pm.f_family_indices, pm.f_fams)
        ]
        perm = np.concatenate(e_cols + f_cols).astype(np.int64)  # new->old
        iperm = np.argsort(perm).astype(np.int64)  # old->new

        # S (f_size x f_size) in f64 on the accelerator via the dense
        # Schur assembly (schur_complement_solver.cc:101 math at D=0,
        # scale=1)
        vflat = tuple(tuple(r) for r in ops.flat.flatten(out["block_jacs"]))
        zeros_r = jnp.zeros((prog.num_residuals,), jnp.float64)
        _, _, ete = ops.flat.fused_post_eval_e(vflat, zeros_r)
        _, _, ftf = ops.flat.fused_post_eval_f(vflat, zeros_r,
                                               with_blocks=True)
        ones_c = jnp.ones((T,), jnp.float64)
        zeros_c = jnp.zeros((T,), jnp.float64)
        _, _, S = ops._assemble(vflat, (tuple(ete), tuple(ftf)),
                                ones_c, zeros_c)
        L = np.asarray(jnp.linalg.cholesky(S))
        if not np.all(np.isfinite(L)):
            return None  # semidefinite core: fall back to full QR
        Rcc = np.ascontiguousarray(L.T)

        newc = iperm[colsA]
        order = np.lexsort((newc, rows))
        rows_s, cols_s, vals_s = rows[order], newc[order], vals[order]
        nrows = int(prog.num_residuals)
        indptr = np.zeros(nrows + 1, np.int64)
        np.cumsum(np.bincount(rows_s, minlength=nrows), out=indptr[1:])
        qr = SparseQR(nrows, T, indptr, cols_s.astype(np.int32), vals_s,
                      schur_tail_split=pm.e_size)
        qr.set_dense(Rcc)
        d = qr.diag()
        d2 = d * d
        if (d2.min() if d2.size else 0.0) <= (
            self.options.min_reciprocal_condition_number
            * (d2.max() if d2.size else 1.0)
        ):
            qr.free()
            return None

        def solve(E):
            Ep = np.asarray(E, np.float64)[perm, :]
            Xp = qr.solve_normal_multi(Ep)
            return Xp[iperm, :]

        solve.close = qr.free
        return solve

    def _cov_block(self, o1, t1, o2, t2) -> np.ndarray:
        if self._cov is not None:
            return self._cov[o1: o1 + t1, o2: o2 + t2]
        m = self._colmap
        if all((o2 + j) in m for j in range(t2)):
            return self._cov_cols[o1: o1 + t1][:, [m[o2 + j] for j in range(t2)]]
        if all((o1 + j) in m for j in range(t1)):
            return self._cov_cols[o2: o2 + t2][:, [m[o1 + j] for j in range(t1)]].T
        raise KeyError(
            "covariance block was not in the covariance_blocks passed to compute()"
        )

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
        C = self._cov_block(o1, t1, o2, t2)
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
        if self._cov is not None:
            idx = np.concatenate([np.arange(o, o + t) for o, t, _ in infos])
            C = self._cov[np.ix_(idx, idx)]
        else:
            C = np.block([
                [self._cov_block(o1, t1, o2, t2) for (o2, t2, _) in infos]
                for (o1, t1, _) in infos
            ])
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
