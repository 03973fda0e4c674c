"""DENSE_SCHUR: materialized Schur complement + dense Cholesky.

TPU-native re-design of the reference's SchurComplementSolver DENSE path
(/root/reference/internal/ceres/schur_complement_solver.cc:101-246 and the
SchurEliminator, schur_eliminator_impl.h:87-400). Where the reference runs
a chunk-parallel eliminator with per-thread buffers writing into a
BlockRandomAccessDenseMatrix, here the reduced camera system

    S = F'F + D_f^2 - W' (E'E + D_e^2)^{-1} W,   W = E'F

is assembled with three batched-einsum scatter passes and two dense GEMMs —
every FLOP on the MXU, no locks, deterministic. Appropriate for problems
with up to a few thousand f-tangent dimensions (the same regime the
reference recommends DENSE_SCHUR for).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import partition as pt


def assemble_w_dense(pm: pt.PartitionedMeta, values):
    """W = E'F as a dense (e_size, f_size) matrix (scatter of per-obs
    t_e x t_f outer products)."""
    W = jnp.zeros((pm.e_size + 1, pm.f_size + 1))
    for k, kind in enumerate(pm.base.kinds):
        e_slot = None
        for s, slot in enumerate(kind.slots):
            if pm.e_idx_keys[k][s] >= 0 and slot.any_variable:
                e_slot = s
        if e_slot is None:
            continue
        Je = values[k][e_slot]
        eidx = pm.idx(pm.e_idx_keys[k][e_slot])  # (B, te)
        for s, slot in enumerate(kind.slots):
            key = pm.f_idx_keys[k][s]
            if key < 0 or not slot.any_variable:
                continue
            Jf = values[k][s]
            contrib = jnp.einsum("bre,brf->bef", Je, Jf)
            fidx = pm.idx(key)
            W = W.at[eidx[:, :, None], fidx[:, None, :]].add(contrib)
    return W[: pm.e_size, : pm.f_size]


def assemble_ftf_dense(pm: pt.PartitionedMeta, values, D_f):
    """F'F + D_f^2 as dense (f_size, f_size)."""
    A = jnp.zeros((pm.f_size + 1, pm.f_size + 1))
    for k, kind in enumerate(pm.base.kinds):
        f_slots = [
            s
            for s, slot in enumerate(kind.slots)
            if pm.f_idx_keys[k][s] >= 0 and slot.any_variable
        ]
        for s1 in f_slots:
            i1 = pm.idx(pm.f_idx_keys[k][s1])
            for s2 in f_slots:
                i2 = pm.idx(pm.f_idx_keys[k][s2])
                contrib = jnp.einsum("bre,brf->bef", values[k][s1], values[k][s2])
                A = A.at[i1[:, :, None], i2[:, None, :]].add(contrib)
    A = A[: pm.f_size, : pm.f_size]
    return A + jnp.diag(D_f * D_f)


def apply_minv_rows(pm: pt.PartitionedMeta, factors, W):
    """(E'E)^{-1} W, blockwise over W's e-block rows."""
    outs = []
    for (off, nv, t, _), L in zip(pm.e_fams, factors):
        rows = jax.lax.dynamic_slice(W, (off, 0), (nv * t, W.shape[1])).reshape(
            nv, t, W.shape[1]
        )
        sol = jax.vmap(lambda Li, B: jax.scipy.linalg.cho_solve((Li, True), B))(
            L, rows
        )
        outs.append(sol.reshape(nv * t, W.shape[1]))
    return jnp.concatenate(outs, axis=0) if outs else W


def dense_schur_solve(pm: pt.PartitionedMeta, values, b, D):
    """Eliminate -> dense Cholesky on S -> back substitute.

    Returns the global tangent solution y minimizing
    ||J y - b||^2 + ||D y||^2."""
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)
    blocks = pt.block_diag_ete(pm, values, D_e)
    factors = [jnp.linalg.cholesky(blk) for blk in blocks]

    W = assemble_w_dense(pm, values)
    MW = apply_minv_rows(pm, factors, W)
    S = assemble_ftf_dense(pm, values, D_f) - W.T @ MW

    etb = pt.left_multiply_e(pm, values, b)
    ftb = pt.left_multiply_f(pm, values, b)
    metb = pt.apply_block_diag_inverse_part(pm.e_fams, factors, etb)
    rhs = ftb - W.T @ metb

    L = jnp.linalg.cholesky(S)
    z = jax.scipy.linalg.cho_solve((L, True), rhs)

    y_e = pt.apply_block_diag_inverse_part(pm.e_fams, factors, etb - W @ z)
    return pt.combine(pm, y_e, z)
