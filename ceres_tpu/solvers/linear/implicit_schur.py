"""Implicit Schur complement + ITERATIVE_SCHUR solver.

TPU-native re-design of /root/reference/internal/ceres/
implicit_schur_complement.{h,cc} (Init :49, RightMultiplyAndAccumulate
:106), iterative_schur_complement_solver.cc:64, and
schur_jacobi_preconditioner.h:78. The Schur complement

    S = F'F + D_f^2 - F'E (E'E + D_e^2)^{-1} E'F

is never materialized: each CG iteration does four partitioned SpMV
products plus batched block-diagonal solves, all fused into one XLA
while-loop. The SCHUR_JACOBI preconditioner block-diag(S)^{-1} is
assembled in one batched einsum pass over observations (replacing the
eliminator-with-diagonal-target run of the reference) and factorized with
batched Cholesky.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops import bsr, partition as pt
from .cg import CGResult, conjugate_gradients


class SchurSystem(NamedTuple):
    """Precomputed per-solve state (ImplicitSchurComplement::Init)."""

    ete_factors: list  # batched Cholesky of E'E + D_e^2, per e-family
    rhs: jax.Array  # F'b - F'E (E'E)^{-1} E'b
    etb: jax.Array  # E'b (for back substitution)


def _minv(pm: pt.PartitionedMeta, factors, v):
    return pt.apply_block_diag_inverse_part(pm.e_fams, factors, v)


def build_schur_system(pm: pt.PartitionedMeta, values, b, D_e) -> SchurSystem:
    blocks = pt.block_diag_ete(pm, values, D_e)
    factors = [jnp.linalg.cholesky(blk) for blk in blocks]
    etb = pt.left_multiply_e(pm, values, b)
    tmp = pt.right_multiply_e(pm, values, _minv(pm, factors, etb))
    rhs = pt.left_multiply_f(pm, values, b - tmp)
    return SchurSystem(ete_factors=factors, rhs=rhs, etb=etb)


def schur_multiply(pm: pt.PartitionedMeta, values, sys: SchurSystem, D_f, z):
    """S z, matrix-free (implicit_schur_complement.cc:106)."""
    fz = pt.right_multiply_f(pm, values, z)
    etfz = pt.left_multiply_e(pm, values, fz)
    e_part = pt.right_multiply_e(pm, values, _minv(pm, sys.ete_factors, etfz))
    out = pt.left_multiply_f(pm, values, fz - e_part)
    return out + (D_f * D_f) * z


def back_substitute(pm: pt.PartitionedMeta, values, sys: SchurSystem, z):
    """y = (E'E + D_e^2)^{-1} (E'b - E'F z) (eliminator BackSubstitute)."""
    fz = pt.right_multiply_f(pm, values, z)
    etfz = pt.left_multiply_e(pm, values, fz)
    return _minv(pm, sys.ete_factors, sys.etb - etfz)


# --------------------------------------------------------------------------
# SCHUR_JACOBI preconditioner: block-diag(S)^{-1}.
# --------------------------------------------------------------------------


def schur_jacobi_blocks(pm: pt.PartitionedMeta, values, sys: SchurSystem, D_f):
    """Per-f-block diagonal blocks of S, batched over observations.

    block(S)[i] = F_i'F_i + D_i^2 - sum_j W_ji' M_j^{-1} W_ji with
    W_ji = E_j' F_ji aggregated per observation (exact when each (e,f)
    block pair shares at most one residual block — the BA structure)."""
    out_blocks = pt.block_diag_ftf(pm, values, D_f)

    # Gather per-e-block inverse factors as dense (t_e, t_e) inverses for
    # einsum use: build M^{-1} blocks per e-family.
    minv_blocks = []
    for (off, nv, t, _), L in zip(pm.e_fams, sys.ete_factors):
        eye = jnp.broadcast_to(jnp.eye(t, dtype=L.dtype), (nv, t, t))
        minv = jax.vmap(lambda Li, I: jax.scipy.linalg.cho_solve((Li, True), I))(L, eye)
        # Append a sentinel zero block for constant/masked rows.
        minv_blocks.append(
            jnp.concatenate([minv, jnp.zeros((1, t, t), minv.dtype)], axis=0)
        )

    part_f = pm.f_family_indices
    part_e = pm.e_family_indices
    for k, kind in enumerate(pm.base.kinds):
        # find the e-slot (at most one) and the f-slots
        e_slot = None
        for s, slot in enumerate(kind.slots):
            if pm.e_bid_keys[k][s] >= 0 and slot.any_variable:
                e_slot = s
        if e_slot is None:
            continue
        slot_e = kind.slots[e_slot]
        efi = part_e.index(slot_e.family_index)
        _, e_nv, te, e_bid_off = pm.e_fams[efi]
        ebid = pm.idx(pm.e_bid_keys[k][e_slot])
        local_e = jnp.clip(ebid - e_bid_off, 0, e_nv)
        Je = values[k][e_slot]
        for s, slot in enumerate(kind.slots):
            key = pm.f_bid_keys[k][s]
            if key < 0 or not slot.any_variable:
                continue
            Jf = values[k][s]
            ffi = part_f.index(slot.family_index)
            _, f_nv, tf, f_bid_off = pm.f_fams[ffi]
            fbid = pm.idx(key)
            local_f = fbid - f_bid_off
            tgt = jnp.where((local_f >= 0) & (local_f < f_nv), local_f, f_nv)
            # Chunked accumulation: the per-observation (tf, tf) correction
            # blocks would otherwise materialize as a (B, tf, tf) temp whose
            # TPU tile padding explodes at scale (observed 25x -> HBM OOM on
            # Venice-class problems).
            B = Je.shape[0]
            CH = 16384
            nch = -(-B // CH)
            pad = nch * CH - B

            def pad0(a):
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, widths)

            Je_c = pad0(Je).reshape(nch, CH, *Je.shape[1:])
            Jf_c = pad0(Jf).reshape(nch, CH, *Jf.shape[1:])
            le_c = pad0(local_e).reshape(nch, CH)
            tgt_c = jnp.concatenate(
                [tgt, jnp.full((pad,), f_nv, tgt.dtype)]
            ).reshape(nch, CH)
            minv_tab = minv_blocks[efi]

            def chunk(acc, args):
                je, jf, le, tg = args
                minv = jnp.take(minv_tab, le, axis=0)
                W = jnp.einsum("bre,brf->bef", je, jf)
                corr = jnp.einsum("bef,beh,bhg->bfg", W, minv, W)
                return acc.at[tg].add(-corr), None

            padded = jnp.concatenate(
                [out_blocks[ffi], jnp.zeros((1, tf, tf), Je.dtype)], axis=0
            )
            padded, _ = jax.lax.scan(chunk, padded, (Je_c, Jf_c, le_c, tgt_c))
            out_blocks[ffi] = padded[:f_nv]
    return out_blocks


def make_schur_jacobi_preconditioner(pm, values, sys, D_f):
    blocks = schur_jacobi_blocks(pm, values, sys, D_f)
    factors = [jnp.linalg.cholesky(b) for b in blocks]

    def apply(v):
        return pt.apply_block_diag_inverse_part(pm.f_fams, factors, v)

    return apply


def iterative_schur_solve(
    pm: pt.PartitionedMeta,
    values,
    b,
    D,
    *,
    q_tolerance: float,
    max_num_iterations: int = 500,
    min_num_iterations: int = 0,
    preconditioner: str = "SCHUR_JACOBI",
    spse_terms: int = 5,
    cluster_assembler=None,
    cluster_structure=None,
    use_spse_initialization: bool = False,
    spse_init_terms: int = 5,
    flat_ops=None,
):
    """Full ITERATIVE_SCHUR step: eliminate -> PCG on S -> back substitute
    (iterative_schur_complement_solver.cc:64 incl. CreatePreconditioner and
    the optional SPSE initial guess, linear_solver.h:174-183).

    When `flat_ops` (ops/flatops.FlatSchurOps) is given, the CG-resident
    S product runs on flattened 2-D layouts with block-row gathers — ~8x
    faster per iteration on TPU than the per-element rank-3 path.

    Returns (x_global_tangent, CGResult)."""
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)
    sys = build_schur_system(pm, values, b, D_e)

    if flat_ops is not None and flat_ops.supported:
        vflat = flat_ops.flatten(values)
        minv_flats = flat_ops.minv_flatten(sys.ete_factors)

        def lhs(z):
            return flat_ops.schur_multiply(vflat, minv_flats, D_f, z)
    else:
        def lhs(z):
            return schur_multiply(pm, values, sys, D_f, z)

    precond = None
    if preconditioner == "SCHUR_JACOBI":
        precond = make_schur_jacobi_preconditioner(pm, values, sys, D_f)
    elif preconditioner == "SCHUR_POWER_SERIES_EXPANSION":
        from .preconditioners import make_spse_preconditioner

        precond = make_spse_preconditioner(
            pm, values, sys, D_f, spse_terms, multiply_fn=lhs
        )
    elif preconditioner in ("CLUSTER_JACOBI", "CLUSTER_TRIDIAGONAL"):
        from .preconditioners import (
            make_cluster_preconditioner,
            make_cluster_tridiagonal_preconditioner,
        )

        if cluster_structure.chains is not None:
            precond = make_cluster_tridiagonal_preconditioner(
                cluster_structure, lambda: cluster_assembler(values, D_e, D_f)
            )
        else:
            precond = make_cluster_preconditioner(
                cluster_structure, lambda: cluster_assembler(values, D_e, D_f)
            )

    x0 = jnp.zeros_like(sys.rhs)
    if use_spse_initialization:
        from .preconditioners import make_spse_preconditioner

        spse = make_spse_preconditioner(
            pm, values, sys, D_f, spse_init_terms, multiply_fn=lhs
        )
        x0 = spse(sys.rhs)

    res = conjugate_gradients(
        lhs,
        sys.rhs,
        x0,
        precond,
        min_num_iterations=min_num_iterations,
        max_num_iterations=max_num_iterations,
        residual_reset_period=10,
        r_tolerance=-1.0,
        q_tolerance=q_tolerance,
    )
    y = back_substitute(pm, values, sys, res.x)
    x = pt.combine(pm, y, res.x)
    return x, res
