"""Generic preconditioned conjugate gradients, fully jit-compiled.

TPU-native equivalent of the reference's templated CG
(/root/reference/internal/ceres/conjugate_gradients_solver.h:109-300): the
same algorithm — including the Nash/Sofer Q-tolerance termination that the
trust-region eta forcing sequence relies on, the r-tolerance check, the
residual refresh every `residual_reset_period`, and the failure taxonomy —
but expressed as a lax.while_loop so the whole Krylov iteration compiles to
one XLA computation (the role CudaCgnrSolver plays on GPU: zero host
round-trips per iteration).

The operator and preconditioner are plain jax callables, so the same solver
runs dense, block-sparse, implicit-Schur, and mesh-sharded operators — the
analog of the reference's ConjugateGradientsLinearOperator templating over
Vector/CudaVector.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

# Termination codes (linear_solver.h:57-74).
CG_NO_CONVERGENCE = 0
CG_SUCCESS = 1
CG_FAILURE = 2


class CGResult(NamedTuple):
    x: jax.Array
    num_iterations: jax.Array  # int32
    termination: jax.Array  # int32 code
    final_norm_r: jax.Array


def conjugate_gradients_host(
    lhs: Callable,
    rhs,
    x0,
    preconditioner: Optional[Callable] = None,
    *,
    min_num_iterations: int = 0,
    max_num_iterations: int = 100,
    residual_reset_period: int = 10,
    r_tolerance: float = -1.0,
    q_tolerance: float = -1.0,
):
    """Host-driven variant of `conjugate_gradients` (same semantics) for
    preconditioners applied outside jit (e.g. the SUBSET preconditioner's
    native sparse triangular solves). lhs may still be a jitted device fn.
    """
    import numpy as np

    if preconditioner is None:
        preconditioner = lambda v: v
    rhs = np.asarray(rhs)
    x = np.asarray(x0, dtype=np.float64).copy()
    norm_rhs = float(np.linalg.norm(rhs))
    if norm_rhs == 0.0:
        return CGResult(jnp.asarray(x * 0.0), jnp.asarray(0), jnp.asarray(CG_SUCCESS), jnp.asarray(0.0))
    tol_r = r_tolerance * norm_rhs
    r = rhs - np.asarray(lhs(jnp.asarray(x)))
    norm_r = float(np.linalg.norm(r))
    if min_num_iterations == 0 and norm_r <= tol_r:
        return CGResult(jnp.asarray(x), jnp.asarray(0), jnp.asarray(CG_SUCCESS), jnp.asarray(norm_r))
    rho = 1.0
    Q0 = -float(x @ (rhs + r))
    p = np.zeros_like(x)
    term = CG_NO_CONVERGENCE
    it = 0
    while True:
        it += 1
        z = np.asarray(preconditioner(r))
        last_rho = rho
        rho = float(r @ z)
        if rho == 0.0 or np.isinf(rho):
            term = CG_FAILURE
            break
        if it == 1:
            p = z.copy()
        else:
            beta = rho / last_rho
            if beta == 0.0 or np.isinf(beta):
                term = CG_FAILURE
                break
            p = z + beta * p
        q = np.asarray(lhs(jnp.asarray(p)))
        pq = float(p @ q)
        if pq <= 0 or np.isinf(pq):
            term = CG_NO_CONVERGENCE
            break
        alpha = rho / pq
        if np.isinf(alpha):
            term = CG_FAILURE
            break
        x = x + alpha * p
        if it % residual_reset_period == 0:
            r = rhs - np.asarray(lhs(jnp.asarray(x)))
        else:
            r = r - alpha * q
        Q1 = -float(x @ (rhs + r))
        zeta = it * (Q1 - Q0) / Q1 if Q1 != 0 else 0.0
        if zeta < q_tolerance and it >= min_num_iterations:
            term = CG_SUCCESS
            break
        Q0 = Q1
        norm_r = float(np.linalg.norm(r))
        if norm_r <= tol_r and it >= min_num_iterations:
            term = CG_SUCCESS
            break
        if it >= max_num_iterations:
            break
    return CGResult(jnp.asarray(x), jnp.asarray(it), jnp.asarray(term), jnp.asarray(norm_r))


def conjugate_gradients(
    lhs: Callable,
    rhs: jax.Array,
    x0: jax.Array,
    preconditioner: Optional[Callable] = None,
    *,
    min_num_iterations: int = 0,
    max_num_iterations: int = 100,
    residual_reset_period: int = 10,
    r_tolerance: float = -1.0,
    q_tolerance: float = -1.0,
    dot: Optional[Callable] = None,
    norm: Optional[Callable] = None,
) -> CGResult:
    """Solve lhs(x) = rhs. All tolerances follow conjugate_gradients_solver.h.

    `dot`/`norm` inject the inner-product implementation — the analog of
    conjugate_gradients_solver.h:109's DenseVectorType template parameter
    (the same CG drives CPU Vector and CudaVector there): sharded callers
    pass psum-closed reductions so the identical tolerance/termination
    semantics run over mesh-partitioned operands."""
    if preconditioner is None:
        preconditioner = lambda v: v
    if dot is None:
        dot = jnp.dot
    if norm is None:
        norm = jnp.linalg.norm

    norm_rhs = norm(rhs)
    tol_r = r_tolerance * norm_rhs

    r0 = rhs - lhs(x0)
    norm_r0 = norm(r0)

    # Q0 = -x'(b + r) / 2-ish energy functional (Nash termination).
    Q0_init = -dot(x0, rhs + r0)

    class S(NamedTuple):
        x: jax.Array
        r: jax.Array
        p: jax.Array
        rho: jax.Array
        Q0: jax.Array
        it: jax.Array
        term: jax.Array
        done: jax.Array
        norm_r: jax.Array

    def cond(s: S):
        return ~s.done

    def body(s: S):
        it = s.it + 1
        z = preconditioner(s.r)
        last_rho = s.rho
        rho = dot(s.r, z)
        rho_bad = (rho == 0.0) | jnp.isinf(rho)

        beta = rho / last_rho
        p = jnp.where(s.it == 0, z, z + beta * s.p)
        beta_bad = (s.it > 0) & ((beta == 0.0) | jnp.isinf(beta))

        q = lhs(p)
        pq = dot(p, q)
        indefinite = (pq <= 0.0) | jnp.isinf(pq)
        alpha = rho / pq
        alpha_bad = jnp.isinf(alpha)

        x = s.x + alpha * p
        # Residual refresh every residual_reset_period iterations.
        refresh = (it % residual_reset_period) == 0
        r = jax.lax.cond(
            refresh,
            lambda: rhs - lhs(x),
            lambda: s.r - alpha * q,
        )
        Q1 = -dot(x, rhs + r)
        zeta = it.astype(rhs.dtype) * (Q1 - s.Q0) / Q1
        norm_r = norm(r)

        q_conv = (zeta < q_tolerance) & (it >= min_num_iterations)
        r_conv = (norm_r <= tol_r) & (it >= min_num_iterations)
        max_hit = it >= max_num_iterations

        failure = rho_bad | beta_bad | alpha_bad
        term = jnp.where(
            failure,
            CG_FAILURE,
            jnp.where(q_conv | r_conv, CG_SUCCESS, CG_NO_CONVERGENCE),
        ).astype(jnp.int32)
        done = failure | indefinite | q_conv | r_conv | max_hit
        # On failure/indefinite, keep the previous iterate x.
        x_out = jnp.where(failure | indefinite, s.x, x)
        return S(x_out, r, p, rho, Q1, it, term, done, norm_r)

    init = S(
        x=x0,
        r=r0,
        p=jnp.zeros_like(x0),
        rho=jnp.asarray(1.0, rhs.dtype),
        Q0=Q0_init,
        it=jnp.asarray(0, jnp.int32),
        term=jnp.asarray(CG_NO_CONVERGENCE, jnp.int32),
        done=(min_num_iterations == 0) & (norm_r0 <= tol_r),
        norm_r=norm_r0,
    )
    # |b| == 0 -> solution 0.
    zero_rhs = norm_rhs == 0.0
    out = jax.lax.while_loop(cond, body, init)
    x_final = jnp.where(zero_rhs, jnp.zeros_like(x0), out.x)
    term = jnp.where(
        zero_rhs | (init.done & (out.it == 0)), CG_SUCCESS, out.term
    ).astype(jnp.int32)
    return CGResult(x_final, out.it, term, out.norm_r)
