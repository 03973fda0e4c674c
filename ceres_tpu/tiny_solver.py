"""TinySolver: self-contained fixed-size dense Levenberg-Marquardt.

TPU-native equivalent of /root/reference/include/ceres/tiny_solver.h (405
LoC; doc :33-60: zero-heap dense LM for latency-critical small problems)
and tiny_solver_autodiff_function.h. The TPU twist: the whole LM loop is a
lax.while_loop, so `solve_batch` vmaps it to solve MILLIONS of independent
small problems in one kernel launch — triangulation, per-track refinement,
ICP point updates — a regime the reference covers one problem at a time.

Uses the Madsen-Nielsen-Tingleff damping update of the reference
(u/v doubling, tiny_solver.h Update/Solve).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TinySolverOptions:
    max_num_iterations: int = 50
    gradient_tolerance: float = 1e-10  # eps^(1/2) in reference terms
    parameter_tolerance: float = 1e-8
    cost_threshold: float = float(jnp.finfo(jnp.float64).eps)
    initial_trust_region_radius: float = 1e4


class TinySolverSummary(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array
    gradient_max_norm: jax.Array


class TinySolver:
    """residual_fn(x, data) -> (m,) residuals; jax-traceable."""

    def __init__(self, residual_fn: Callable, options: TinySolverOptions = TinySolverOptions()):
        self.residual_fn = residual_fn
        self.options = options
        self._solve = jax.jit(self._make_solve())
        self._solve_batch = jax.jit(jax.vmap(self._make_solve(), in_axes=(0, 0)))

    def _make_solve(self):
        fn = self.residual_fn
        o = self.options

        def eval_rj(x, data):
            r = fn(x, data)
            J = jax.jacfwd(fn)(x, data)
            return r, J

        def solve(x0, data=None):
            r0, J0 = eval_rj(x0, data)
            cost0 = 0.5 * jnp.dot(r0, r0)

            class S(NamedTuple):
                x: jax.Array
                r: jax.Array
                J: jax.Array
                cost: jax.Array
                u: jax.Array  # damping
                v: jax.Array  # damping growth
                it: jax.Array
                done: jax.Array
                gmax: jax.Array

            jtj0 = J0.T @ J0
            u0 = 1.0 / o.initial_trust_region_radius * jnp.max(jnp.diag(jtj0))

            def cond(s):
                return ~s.done

            def body(s):
                jtj = s.J.T @ s.J
                g = s.J.T @ s.r
                gmax = jnp.max(jnp.abs(g))
                n = s.x.shape[0]
                A = jtj + s.u * jnp.eye(n, dtype=s.x.dtype)
                L = jnp.linalg.cholesky(A)
                dx = -jax.scipy.linalg.cho_solve((L, True), g)
                bad_solve = ~jnp.all(jnp.isfinite(dx))
                x_new = s.x + jnp.where(bad_solve, 0.0, dx)
                r_new, J_new = eval_rj(x_new, data)
                cost_new = 0.5 * jnp.dot(r_new, r_new)
                # predicted reduction: 0.5 dx'(u dx - g) (MNT eq. 2.20)
                pred = jnp.dot(dx, s.u * dx - g) * 0.5
                rho = (s.cost - cost_new) / jnp.where(pred == 0, 1e-300, pred)
                accept = (rho > 0) & (~bad_solve) & jnp.isfinite(cost_new)
                # Madsen-Nielsen-Tingleff damping update.
                u_acc = s.u * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                u = jnp.where(accept, u_acc, s.u * s.v)
                v = jnp.where(accept, 2.0, 2.0 * s.v)
                x = jnp.where(accept, x_new, s.x)
                r = jnp.where(accept, r_new, s.r)
                J = jnp.where(accept, J_new, s.J)
                cost = jnp.where(accept, cost_new, s.cost)
                it = s.it + 1
                step_norm = jnp.linalg.norm(dx)
                x_norm = jnp.linalg.norm(s.x)
                done = (
                    (gmax <= o.gradient_tolerance)
                    | (
                        accept
                        & (
                            step_norm
                            <= o.parameter_tolerance * (x_norm + o.parameter_tolerance)
                        )
                    )
                    | (cost <= o.cost_threshold)
                    | (it >= o.max_num_iterations)
                )
                return S(x, r, J, cost, u, v, it, done, gmax)

            init = S(
                x=x0,
                r=r0,
                J=J0,
                cost=cost0,
                u=u0,
                v=jnp.asarray(2.0, x0.dtype),
                it=jnp.asarray(0, jnp.int32),
                done=~jnp.isfinite(cost0),
                gmax=jnp.asarray(jnp.inf, x0.dtype),
            )
            out = jax.lax.while_loop(cond, body, init)
            return out.x, TinySolverSummary(cost0, out.cost, out.it, out.gmax)

        return solve

    def solve(self, x0, data=None):
        return self._solve(jnp.asarray(x0), data)

    def solve_batch(self, x0_batch, data_batch):
        """Solve B independent problems in one launch (vmapped LM)."""
        return self._solve_batch(jnp.asarray(x0_batch), data_batch)
