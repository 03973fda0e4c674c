"""CGNR: conjugate gradients on the normal equations (A'A + D'D) x = A'b.

TPU-native equivalent of /root/reference/internal/ceres/cgnr_solver.cc
(CgnrSolver + CudaCgnrSolver, :70-392): the operator is matrix-free over the
block Jacobian (two batched-einsum SpMVs per CG iteration), preconditioned
by block-Jacobi — block-diag(J'J + D^2)^{-1} with batched Cholesky factors
(block_jacobi_preconditioner.cc equivalent). The entire solve compiles into
one XLA while-loop; on TPU the SpMVs hit the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...ops import bsr
from .cg import CGResult, conjugate_gradients


def make_block_jacobi_preconditioner(meta: bsr.BlockJacobianMeta, values, D):
    """Factorize block-diag(J'J + D^2) once per solve."""
    blocks = bsr.block_diag_jtj(meta, values, D)
    factors = bsr.factorize_block_diag(blocks)

    def apply(v):
        return bsr.apply_block_diag_inverse(meta, factors, v)

    return apply


def cgnr_solve(
    meta: bsr.BlockJacobianMeta,
    values,
    b,
    D,
    *,
    q_tolerance: float,
    r_tolerance: float = -1.0,
    max_num_iterations: int = 500,
    min_num_iterations: int = 0,
    preconditioner: str = "JACOBI",
    flat_ops=None,
) -> CGResult:
    """min ||J y - b||^2 + ||D y||^2 via CG on the normal equations.

    With `flat_ops` (ops/flatops.FlatJacobianOps) the loop-resident J
    products and preconditioner apply run on flattened 2-D layouts."""

    if flat_ops is not None and flat_ops.supported:
        vflat = flat_ops.flatten(values)

        def lhs(x):
            return flat_ops.normal_multiply(vflat, D, x)

        rhs = flat_ops.left(vflat, b)
        precond = None
        if preconditioner == "JACOBI":
            blocks = bsr.block_diag_jtj(meta, values, D)
            inv_flats = flat_ops.inv_flatten(bsr.factorize_block_diag(blocks))

            def precond(v):
                return flat_ops.inv_apply(inv_flats, v)

        return conjugate_gradients(
            lhs,
            rhs,
            jnp.zeros_like(rhs),
            precond,
            min_num_iterations=min_num_iterations,
            max_num_iterations=max_num_iterations,
            residual_reset_period=10,
            r_tolerance=r_tolerance,
            q_tolerance=q_tolerance,
        )

    def lhs(x):
        jx = bsr.right_multiply(meta, values, x)
        jtjx = bsr.left_multiply(meta, values, jx)
        return jtjx + (D * D) * x

    rhs = bsr.left_multiply(meta, values, b)
    precond = None
    if preconditioner == "JACOBI":
        precond = make_block_jacobi_preconditioner(meta, values, D)
    return conjugate_gradients(
        lhs,
        rhs,
        jnp.zeros_like(rhs),
        precond,
        min_num_iterations=min_num_iterations,
        max_num_iterations=max_num_iterations,
        residual_reset_period=10,
        r_tolerance=r_tolerance,
        q_tolerance=q_tolerance,
    )
