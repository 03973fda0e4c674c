"""Robust loss functions and the Triggs corrector, batched for TPU.

TPU-native re-design of the reference's loss machinery
(/root/reference/include/ceres/loss_function.h:86-391,
/root/reference/internal/ceres/loss_function.cc,
/root/reference/internal/ceres/corrector.cc). Instead of a per-residual-block
virtual call, every loss here maps ``s -> (rho, rho', rho'')`` elementwise over
an array of squared norms so an entire residual *kind* is robustified in one
fused VPU pass, and the corrector is applied as a batched rank-1 update.

All functions are jax-traceable (usable under jit/vmap/grad).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_TINY = float(2.2250738585072014e-308)  # DBL_MIN, like std::numeric_limits min


class LossFunction:
    """Base class: rho(s) and its first two derivatives, elementwise.

    ``evaluate(s) -> (rho0, rho1, rho2)`` with each output shaped like ``s``.
    """

    def evaluate(self, s: Array) -> Tuple[Array, Array, Array]:
        raise NotImplementedError

    def __call__(self, s: Array) -> Tuple[Array, Array, Array]:
        return self.evaluate(s)


@dataclasses.dataclass(frozen=True)
class TrivialLoss(LossFunction):
    """rho(s) = s (no robustification)."""

    def evaluate(self, s):
        one = jnp.ones_like(s)
        return s, one, jnp.zeros_like(s)


@dataclasses.dataclass(frozen=True)
class HuberLoss(LossFunction):
    """Quadratic for s<=a^2, linear beyond (loss_function.cc:52-65)."""

    a: float

    def evaluate(self, s):
        b = self.a * self.a
        r = jnp.sqrt(jnp.maximum(s, _TINY))
        outlier = s > b
        rho0 = jnp.where(outlier, 2.0 * self.a * r - b, s)
        rho1 = jnp.where(outlier, jnp.maximum(_TINY, self.a / r), 1.0)
        rho2 = jnp.where(outlier, -rho1 / (2.0 * jnp.maximum(s, _TINY)), 0.0)
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class SoftLOneLoss(LossFunction):
    """rho(s) = 2 b (sqrt(1 + s/b) - 1) (loss_function.cc:68-75)."""

    a: float

    def evaluate(self, s):
        b = self.a * self.a
        c = 1.0 / b
        total = 1.0 + s * c
        tmp = jnp.sqrt(total)
        rho0 = 2.0 * b * (tmp - 1.0)
        rho1 = jnp.maximum(_TINY, 1.0 / tmp)
        rho2 = -(c * rho1) / (2.0 * total)
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class CauchyLoss(LossFunction):
    """rho(s) = b log(1 + s/b) (loss_function.cc:77-84)."""

    a: float

    def evaluate(self, s):
        b = self.a * self.a
        c = 1.0 / b
        total = 1.0 + s * c
        inv = 1.0 / total
        rho0 = b * jnp.log(total)
        rho1 = jnp.maximum(_TINY, inv)
        rho2 = -c * inv * inv
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class ArctanLoss(LossFunction):
    """rho(s) = a atan2(s, a) (loss_function.cc:86-93)."""

    a: float

    def evaluate(self, s):
        b = 1.0 / (self.a * self.a)
        inv = 1.0 / (1.0 + s * s * b)
        rho0 = self.a * jnp.arctan2(s, jnp.full_like(s, self.a))
        rho1 = jnp.maximum(_TINY, inv)
        rho2 = -2.0 * s * b * inv * inv
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class TolerantLoss(LossFunction):
    """Flat near zero, linear beyond ``a`` with transition width ``b``
    (loss_function.cc:101-119)."""

    a: float
    b: float

    def evaluate(self, s):
        a, b = self.a, self.b
        c = b * jnp.log1p(jnp.exp(-a / b))  # rho(0) offset so rho(0)==0
        x = (s - a) / b
        # Large-x overflow guard mirrors the reference's x > kLog2Max branch.
        big = x > 36.0
        e_x = jnp.exp(jnp.where(big, 0.0, x))
        rho0 = jnp.where(big, s - a - c, b * jnp.log1p(e_x) - c)
        rho1 = jnp.where(big, 1.0, jnp.maximum(_TINY, e_x / (1.0 + e_x)))
        rho2 = jnp.where(big, 0.0, 0.5 / (b * (1.0 + jnp.cosh(jnp.where(big, 0.0, x)))))
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class TukeyLoss(LossFunction):
    """Biweight: zero gradient beyond ``a`` (loss_function.cc:122-136)."""

    a: float

    def evaluate(self, s):
        a2 = self.a * self.a
        inlier = s <= a2
        value = jnp.where(inlier, 1.0 - s / a2, 0.0)
        value_sq = value * value
        rho0 = jnp.where(inlier, a2 / 3.0 * (1.0 - value_sq * value), a2 / 3.0)
        rho1 = jnp.where(inlier, value_sq, 0.0)
        rho2 = jnp.where(inlier, -2.0 / a2 * value, 0.0)
        return rho0, rho1, rho2


@dataclasses.dataclass(frozen=True)
class ComposedLoss(LossFunction):
    """rho(s) = f(g(s)) (loss_function.cc:156-165)."""

    f: LossFunction
    g: LossFunction

    def evaluate(self, s):
        g0, g1, g2 = self.g.evaluate(s)
        f0, f1, f2 = self.f.evaluate(g0)
        return f0, f1 * g1, f2 * g1 * g1 + f1 * g2


@dataclasses.dataclass(frozen=True)
class ScaledLoss(LossFunction):
    """rho(s) = a * wrapped(s); wrapped=None means a*s
    (loss_function.cc:167-177)."""

    rho: "LossFunction | None"
    a: float

    def evaluate(self, s):
        if self.rho is None:
            return self.a * s, jnp.full_like(s, self.a), jnp.zeros_like(s)
        r0, r1, r2 = self.rho.evaluate(s)
        return self.a * r0, self.a * r1, self.a * r2


class LossFunctionWrapper(LossFunction):
    """Mutable holder so the loss can be swapped between solves
    (loss_function.h LossFunctionWrapper). Mutating it changes the traced
    computation, so the evaluator re-jits on change (structure epoch bump)."""

    def __init__(self, rho: "LossFunction | None"):
        self.rho = rho

    def reset(self, rho: "LossFunction | None"):
        self.rho = rho

    def evaluate(self, s):
        if self.rho is None:
            return TrivialLoss().evaluate(s)
        return self.rho.evaluate(s)


# ---------------------------------------------------------------------------
# Corrector (Triggs et al. / BAMS eq. 11), batched over residual blocks.
# ---------------------------------------------------------------------------


def corrector_coefficients(sq_norm: Array, rho1: Array, rho2: Array):
    """Per-block (residual_scaling, alpha/sq_norm) per corrector.cc:41-111.

    In the outlier region (rho'' <= 0) or at zero residual only first-order
    scaling applies; otherwise the clamped Triggs rank-1 curvature correction.
    """
    sqrt_rho1 = jnp.sqrt(rho1)
    simple = (sq_norm == 0.0) | (rho2 <= 0.0)
    safe_sq = jnp.where(simple, 1.0, sq_norm)
    D = 1.0 + 2.0 * safe_sq * jnp.where(simple, 0.0, rho2) / rho1
    alpha = 1.0 - jnp.sqrt(jnp.maximum(D, 0.0))
    residual_scaling = jnp.where(simple, sqrt_rho1, sqrt_rho1 / (1.0 - alpha))
    alpha_sq_norm = jnp.where(simple, 0.0, alpha / safe_sq)
    return residual_scaling, alpha_sq_norm, sqrt_rho1


def correct_residuals_and_jacobians(loss: "LossFunction | None", residuals, jacobians):
    """Apply a robust loss to batched per-kind residuals and Jacobian blocks.

    residuals: (B, r); jacobians: list of (B, r, p_i) arrays (may be empty for
    residual-only evaluation). Returns (cost_per_block, corrected_residuals,
    corrected_jacobians). Matches ResidualBlock::Evaluate order
    (residual_block.cc:176-194): Jacobian corrected with the *raw* residuals,
    then residuals scaled; cost is 0.5 * rho(||r||^2).
    """
    sq_norm = jnp.sum(residuals * residuals, axis=-1)
    if loss is None or isinstance(loss, TrivialLoss):
        return 0.5 * sq_norm, residuals, jacobians
    rho0, rho1, rho2 = loss.evaluate(sq_norm)
    res_scale, alpha_sq_norm, sqrt_rho1 = corrector_coefficients(sq_norm, rho1, rho2)
    new_jacs = []
    for J in jacobians:
        # J <- sqrt_rho1 * (J - alpha_sq_norm * r (r^T J)), batched over B.
        rTj = jnp.einsum("br,brp->bp", residuals, J)
        corr = J - alpha_sq_norm[:, None, None] * residuals[:, :, None] * rTj[:, None, :]
        new_jacs.append(sqrt_rho1[:, None, None] * corr)
    new_res = res_scale[:, None] * residuals
    return 0.5 * rho0, new_res, new_jacs
