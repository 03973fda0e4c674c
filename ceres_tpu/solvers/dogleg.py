"""Dogleg trust-region strategy: TRADITIONAL and SUBSPACE.

TPU-native re-design of /root/reference/internal/ceres/dogleg_strategy.cc
(719 LoC; header dogleg_strategy.h:56). Semantics preserved:

 - elliptical trust region via D = sqrt(clamp(diag(J'J))) substitution;
 - Gauss-Newton point solved with mu-regularization, mu escalated by 10x on
   numerical failure (ComputeGaussNewtonStep, :520-568), halved back (with
   floor) on acceptance;
 - Cauchy point alpha = |g|^2/|Jg|^2; traditional dogleg piecewise path;
 - subspace dogleg: orthonormal {g, gn} basis (rank-revealing QR), exact
   2-D boundary problem via the quartic Lagrange polynomial
   (MakePolynomialForBoundaryConstrainedProblem, :418-440), first-order
   KKT cosine check, traditional fallback;
 - radius update: quality<0.25 -> r/2; quality>0.75 -> r=max(r, 3|step|);
   reject -> r/2 and reuse cached GN point.

The O(n) vector work is jitted; the 2x2 subspace algebra and quartic root
finding run host-side (scalars), as in the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..options import Options
from ..types import DoglegType, LinearSolverTerminationType
from ..utils.polynomial import find_polynomial_roots
from .trust_region import StepResult

_K_MIN_MU = 1e-8
_K_MAX_MU = 1.0


class DoglegStrategy:
    """Drop-in alternative to LevenbergMarquardtStrategy (same interface)."""

    def __init__(self, options: Options, kernels):
        self.options = options
        self.k = kernels
        self.radius = options.initial_trust_region_radius
        self.max_radius = options.max_trust_region_radius
        self.dogleg_type = options.dogleg_type
        self.mu = _K_MIN_MU
        self.increase_threshold = 0.75
        self.decrease_threshold = 0.25
        self.reuse = False
        # cached per-evaluation-point state
        self._diagonal = None  # sqrt-scaled
        self._gradient = None
        self._gn = None
        self._alpha = None
        self._dogleg_step_norm = 0.0
        self._build_kernels()

    def _build_kernels(self):
        k = self.k

        @jax.jit
        def cauchy_alpha(J, residuals, diag_sqrt):
            # scaled gradient g = D^-1 J^T r ; alpha = |g|^2 / |J D^-1 g/D|^2
            g_ambient = residuals @ J  # J^T r for dense; see BSR variant below
            g = g_ambient / diag_sqrt
            Jg = J @ (g / diag_sqrt)
            return g, jnp.sum(g * g) / jnp.sum(Jg * Jg)

        self._cauchy_dense = cauchy_alpha

    # ---- per-iteration computations (work on kernels' jac representation) --

    def _compute_gradient_alpha(self, m, diag_sqrt):
        """gradient in scaled space + Cauchy alpha, via the kernel tier."""
        k = m.k
        if hasattr(k, "meta"):  # block-sparse tier
            from ..ops import bsr

            meta = k.meta

            @jax.jit
            def f(values, residuals, ds):
                g = bsr.left_multiply(meta, values, residuals) / ds
                Jg = bsr.right_multiply(meta, values, g / ds)
                return g, jnp.sum(g * g) / jnp.sum(Jg * Jg)

            return f(m.jacobian, m.residuals, diag_sqrt)
        return self._cauchy_dense(m.jacobian, m.residuals, diag_sqrt)

    def _gauss_newton(self, m, diag_sqrt):
        """GN point with mu escalation on failure; returns (gn, term)."""
        while self.mu < _K_MAX_MU:
            diagonal = (diag_sqrt * diag_sqrt) * self.mu  # D^2 * mu
            # Reuse the kernel's compute_step with identity column scale and
            # radius=1 so lm_D = sqrt(diagonal) = D sqrt(mu) (reference
            # ComputeGaussNewtonStep semantics).
            step, delta, mcc, iters = m.k.compute_step(
                m.jacobian, m.residuals, jnp.ones_like(diag_sqrt), diagonal, 1.0
            )
            ok = bool(jnp.all(jnp.isfinite(step)))
            if ok:
                # kernel returns step minimizing ||J s + r||^2 + |D s|^2 in
                # *unscaled* coords (scale=1); convert to scaled space:
                gn_scaled = jnp.asarray(step) * diag_sqrt
                return gn_scaled, LinearSolverTerminationType.SUCCESS
            self.mu *= 10.0
        return None, LinearSolverTerminationType.FAILURE

    def compute_step(self, m) -> StepResult:
        if not self.reuse:
            diag = m.k.lm_diagonal(m.jacobian, jnp.ones(m.program.tangent_size))
            self._diag_sqrt = jnp.sqrt(diag)
            g, alpha = self._compute_gradient_alpha(m, self._diag_sqrt)
            self._gradient = g
            self._alpha = float(alpha)
            gn, term = self._gauss_newton(m, self._diag_sqrt)
            if gn is None:
                return StepResult(termination=LinearSolverTerminationType.FAILURE)
            self._gn = gn
        self.reuse = True

        if self.dogleg_type == DoglegType.TRADITIONAL_DOGLEG:
            step_scaled = self._traditional()
        else:
            step_scaled = self._subspace(m)
        # back to unscaled tangent coordinates
        step = step_scaled / self._diag_sqrt
        # model cost change via kernel's SpMV; jacobi scaling is identity in
        # this strategy (the ellipse substitution replaces it).
        mcc = self._model_cost_change(m, step)
        if not np.isfinite(float(mcc)):
            return StepResult(termination=LinearSolverTerminationType.FAILURE)
        return StepResult(
            delta=step,
            model_cost_change=float(mcc),
            termination=LinearSolverTerminationType.SUCCESS,
        )

    def _model_cost_change(self, m, step):
        if hasattr(m.k, "meta"):
            from ..ops import bsr

            jstep = bsr.right_multiply(m.k.meta, m.jacobian, step)
        else:
            jstep = m.jacobian @ step
        return -jnp.dot(jstep, m.residuals + jstep / 2.0)

    # ---- geometry ---------------------------------------------------------

    def _traditional(self):
        g = np.asarray(self._gradient)
        gn = np.asarray(self._gn)
        radius = self.radius
        gnorm = np.linalg.norm(g)
        gn_norm = np.linalg.norm(gn)
        if gn_norm <= radius:
            self._dogleg_step_norm = gn_norm
            return jnp.asarray(gn)
        if gnorm * self._alpha >= radius:
            self._dogleg_step_norm = radius
            return jnp.asarray(-(radius / gnorm) * g)
        a_dot_b = -self._alpha * float(g @ gn)
        a2 = (self._alpha * gnorm) ** 2
        b_minus_a2 = a2 - 2 * a_dot_b + gn_norm**2
        c = a_dot_b - a2
        d = np.sqrt(c * c + b_minus_a2 * (radius**2 - a2))
        beta = (d - c) / b_minus_a2 if c <= 0 else (radius**2 - a2) / (d + c)
        step = (-self._alpha * (1.0 - beta)) * g + beta * gn
        self._dogleg_step_norm = float(np.linalg.norm(step))
        return jnp.asarray(step)

    def _subspace(self, m):
        g = np.asarray(self._gradient)
        gn = np.asarray(self._gn)
        radius = self.radius
        gn_norm = np.linalg.norm(gn)
        if gn_norm <= radius:
            self._dogleg_step_norm = gn_norm
            return jnp.asarray(gn)
        basis_in = np.stack([g, gn], axis=1)
        q, r, piv = _colpiv_qr(basis_in)
        rank = int(np.sum(np.abs(np.diag(r)) > 1e-14 * max(1.0, abs(r[0, 0]))))
        if rank <= 1:
            self._dogleg_step_norm = radius
            return jnp.asarray(-(radius / np.linalg.norm(g)) * g)
        U = q[:, :2]  # orthonormal basis
        sg = U.T @ g
        # B = (J D^-1 U)^T (J D^-1 U)
        cols = []
        for i in range(2):
            v = jnp.asarray(U[:, i]) / self._diag_sqrt
            if hasattr(m.k, "meta"):
                from ..ops import bsr

                cols.append(np.asarray(bsr.right_multiply(m.k.meta, m.jacobian, v)))
            else:
                cols.append(np.asarray(m.jacobian @ v))
        Jb = np.stack(cols, axis=0)
        B = Jb @ Jb.T
        minimum = self._find_minimum_on_boundary(B, sg, radius)
        if minimum is None:
            return self._traditional()
        grad_min = B @ minimum + sg
        denom = np.linalg.norm(minimum) * np.linalg.norm(grad_min)
        cosine = -float(minimum @ grad_min) / denom if denom > 0 else 1.0
        if cosine < 0.99:
            return self._traditional()
        step = U @ minimum
        self._dogleg_step_norm = radius
        return jnp.asarray(step)

    def _find_minimum_on_boundary(self, B, g2, radius):
        detB = float(np.linalg.det(B))
        trB = float(np.trace(B))
        r2 = radius * radius
        B_adj = np.array([[B[1, 1], -B[0, 1]], [-B[1, 0], B[0, 0]]])
        poly = np.array(
            [
                r2,
                2.0 * r2 * trB,
                r2 * (trB * trB + 2.0 * detB) - float(g2 @ g2),
                -2.0 * (float(g2 @ B_adj @ g2) - r2 * detB * trB),
                r2 * detB * detB - float((B_adj @ g2) @ (B_adj @ g2)),
            ]
        )
        try:
            roots_real, _ = find_polynomial_roots(poly)
        except Exception:
            return None
        best, best_val = None, np.inf
        for y in roots_real:
            try:
                x = -np.linalg.solve(B + y * np.eye(2), g2)
            except np.linalg.LinAlgError:
                continue
            nx = np.linalg.norm(x)
            if nx > 0:
                xb = (radius / nx) * x
                f = 0.5 * float(xb @ B @ xb) + float(g2 @ xb)
                if f < best_val:
                    best_val, best = f, x
        return best

    # ---- radius/mu bookkeeping -------------------------------------------

    def step_accepted(self, step_quality: float):
        assert step_quality > 0.0
        if step_quality < self.decrease_threshold:
            self.radius *= 0.5
        if step_quality > self.increase_threshold:
            self.radius = max(self.radius, 3.0 * self._dogleg_step_norm)
        self.radius = min(self.radius, self.max_radius)
        self.mu = max(_K_MIN_MU, 2.0 * self.mu / 10.0)
        self.reuse = False

    def step_rejected(self, step_quality: float):
        self.radius *= 0.5
        self.reuse = True

    def step_is_invalid(self):
        self.mu *= 10.0
        self.reuse = False


def _colpiv_qr(A):
    """Column-pivoted QR via numpy (scipy-free)."""
    try:
        import scipy.linalg as sl

        q, r, piv = sl.qr(A, pivoting=True, mode="economic")
        return q, r, piv
    except Exception:
        q, r = np.linalg.qr(A)
        return q, r, np.arange(A.shape[1])
