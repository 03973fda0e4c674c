"""Cubic Hermite interpolation of sampled data, autodiff-able.

TPU-native equivalent of /root/reference/include/ceres/cubic_interpolation.h
(444 LoC): CubicInterpolator / BiCubicInterpolator over Grid1D / Grid2D so
sampled cost functions (images, lookup tables) can sit inside autodiff
functors. Uses the same Catmull-Rom / cubic convolution kernel
(cubic_interpolation.h CubicHermiteSpline) with clamped boundary handling;
derivatives come for free from jax AD and match the reference's analytic
df/dx because the spline is evaluated as a polynomial in the fractional
coordinate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _hermite(p0, p1, p2, p3, x):
    """Catmull-Rom cubic on [0,1] given 4 control values (leading axis =
    interpolation dim; trailing axes pass through)."""
    a = 0.5 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3)
    b = 0.5 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
    c = 0.5 * (-p0 + p2)
    d = p1
    return d + x * (c + x * (b + x * a))


class Grid1D:
    """cubic_interpolation.h Grid1D: values (N,) or (N, dim) with clamped
    out-of-range access."""

    def __init__(self, values):
        v = jnp.asarray(values, jnp.float64)
        if v.ndim == 1:
            v = v[:, None]
        self.values = v
        self.n = v.shape[0]

    def __call__(self, i):
        i = jnp.clip(i, 0, self.n - 1)
        return self.values[i]


class CubicInterpolator:
    """f(x) with x in [0, N-1]; jax-differentiable (Evaluate with df/dx)."""

    def __init__(self, grid: Grid1D):
        self.grid = grid

    def evaluate(self, x):
        xf = jnp.floor(x)
        n = jnp.clip(xf.astype(jnp.int32), 0, self.grid.n - 1)
        frac = x - n  # reference clamps x then interpolates from floor cell
        p0 = self.grid(n - 1)
        p1 = self.grid(n)
        p2 = self.grid(n + 1)
        p3 = self.grid(n + 2)
        out = _hermite(p0, p1, p2, p3, frac)
        return out[0] if out.shape == (1,) else out

    def __call__(self, x):
        return self.evaluate(x)


class Grid2D:
    """values (R, C) or (R, C, dim), row-major, clamped."""

    def __init__(self, values):
        v = jnp.asarray(values, jnp.float64)
        if v.ndim == 2:
            v = v[:, :, None]
        self.values = v
        self.rows = v.shape[0]
        self.cols = v.shape[1]

    def __call__(self, r, c):
        r = jnp.clip(r, 0, self.rows - 1)
        c = jnp.clip(c, 0, self.cols - 1)
        return self.values[r, c]


class BiCubicInterpolator:
    """f(r, c); separable bicubic (cubic_interpolation.h BiCubic)."""

    def __init__(self, grid: Grid2D):
        self.grid = grid

    def evaluate(self, r, c):
        rf = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, self.grid.rows - 1)
        cf = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, self.grid.cols - 1)
        fr = r - rf
        fc = c - cf
        rows = []
        for dr in (-1, 0, 1, 2):
            cols = [self.grid(rf + dr, cf + dc) for dc in (-1, 0, 1, 2)]
            rows.append(_hermite(cols[0], cols[1], cols[2], cols[3], fc))
        out = _hermite(rows[0], rows[1], rows[2], rows[3], fr)
        return out[0] if out.shape == (1,) else out

    def __call__(self, r, c):
        return self.evaluate(r, c)
