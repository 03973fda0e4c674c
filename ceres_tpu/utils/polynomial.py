"""Polynomial root finding and interpolation-based 1-D minimization.

Host-side numerics mirroring /root/reference/internal/ceres/polynomial.{h,cc}
(394 LoC): companion-matrix root finding, minimization of an interpolating
polynomial over an interval (used by the line searches and the subspace
dogleg), and fitting a polynomial to function samples (value and/or
gradient). These run between device steps on scalars, so plain numpy is the
right tool (the reference uses Eigen on the host for the same reason).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


def find_polynomial_roots(poly: np.ndarray) -> "Tuple[np.ndarray, np.ndarray]":
    """Roots of polynomial with coefficients poly[0] x^n + ... + poly[n]
    (companion matrix eigenvalues, polynomial.cc FindPolynomialRoots).
    Returns (real_parts, imag_parts)."""
    poly = np.trim_zeros(np.asarray(poly, dtype=np.float64), "f")
    if poly.size == 0:
        raise ValueError("all-zero polynomial")
    if poly.size == 1:
        return np.array([]), np.array([])
    roots = np.roots(poly)
    return roots.real, roots.imag


def evaluate_polynomial(poly: Sequence[float], x: float) -> float:
    return float(np.polyval(np.asarray(poly), x))


def differentiate_polynomial(poly: Sequence[float]) -> np.ndarray:
    return np.polyder(np.asarray(poly, dtype=np.float64))


def minimize_polynomial(
    poly: Sequence[float], x_min: float, x_max: float
) -> Tuple[float, float]:
    """Global minimum of the polynomial on [x_min, x_max]
    (polynomial.cc MinimizePolynomial): check interval ends + real critical
    points inside."""
    poly = np.asarray(poly, dtype=np.float64)
    candidates = [x_min, x_max]
    if poly.size > 2:
        real, imag = find_polynomial_roots(differentiate_polynomial(poly))
        for r, im in zip(real, imag):
            if abs(im) < 1e-12 and x_min <= r <= x_max:
                candidates.append(float(r))
    values = [evaluate_polynomial(poly, c) for c in candidates]
    i = int(np.argmin(values))
    return candidates[i], values[i]


@dataclasses.dataclass
class FunctionSample:
    """function_sample.h equivalent."""

    x: float = 0.0
    value: float = 0.0
    gradient: float = 0.0
    value_is_valid: bool = False
    gradient_is_valid: bool = False

    @staticmethod
    def value_only(x, value):
        return FunctionSample(x=x, value=value, value_is_valid=True)

    @staticmethod
    def with_gradient(x, value, gradient):
        return FunctionSample(
            x=x, value=value, gradient=gradient,
            value_is_valid=True, gradient_is_valid=True,
        )


def find_interpolating_polynomial(samples: List[FunctionSample]) -> np.ndarray:
    """Least-squares fit of the minimal-degree polynomial matching the
    sample constraints (polynomial.cc FindInterpolatingPolynomial)."""
    num_constraints = sum(s.value_is_valid for s in samples) + sum(
        s.gradient_is_valid for s in samples
    )
    degree = num_constraints - 1
    n = degree + 1
    A = []
    b = []
    for s in samples:
        powers = np.array([s.x**(degree - j) for j in range(n)])
        if s.value_is_valid:
            A.append(powers)
            b.append(s.value)
        if s.gradient_is_valid:
            dpow = np.array(
                [
                    (degree - j) * s.x ** (degree - j - 1) if degree - j >= 1 else 0.0
                    for j in range(n)
                ]
            )
            A.append(dpow)
            b.append(s.gradient)
    sol, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    return sol


def minimize_interpolating_polynomial(
    samples: List[FunctionSample], x_min: float, x_max: float
) -> Tuple[float, float]:
    """polynomial.cc MinimizeInterpolatingPolynomial."""
    poly = find_interpolating_polynomial(samples)
    x, v = minimize_polynomial(poly, x_min, x_max)
    # Also consider samples inside the interval (reference semantics).
    for s in samples:
        if s.value_is_valid and x_min <= s.x <= x_max and s.value < v:
            x, v = s.x, s.value
    return x, v
