"""Cost functions: the user-facing residual interface.

TPU-native replacement for the reference's Jet-template autodiff stack
(/root/reference/include/ceres/jet.h:211 — 1495 LoC of dual-number math,
/root/reference/include/ceres/internal/autodiff.h:252,
autodiff_cost_function.h:156, numeric_diff_cost_function.h:182,
cost_function.h:64, sized_cost_function.h:50). Here a cost function is a
jax-traceable callable; Jacobians come from `jax.jacfwd` (forward mode — the
exact analog of Jets, and batched over every residual block of the same kind
by `vmap` instead of pointer-chased one block at a time).

Every cost function exposes:
  residuals(params: tuple[Array...], data) -> Array (num_residuals,)
  residuals_and_jacobians(params, data) -> (res, list[J_i (num_residuals, size_i)])

`data` is a per-residual-block pytree (observations etc.); the evaluator
stacks it across blocks of a kind and vmaps.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import NumericDiffMethodType

Array = jax.Array


class CostFunction:
    """Base interface (cost_function.h:64 analog).

    Subclasses set ``num_residuals`` and ``parameter_block_sizes`` and
    implement ``residuals``. ``residuals_and_jacobians`` defaults to
    forward-mode autodiff over all parameter blocks.
    """

    num_residuals: int
    parameter_block_sizes: Tuple[int, ...]

    def residuals(self, params: Sequence[Array], data=None) -> Array:
        raise NotImplementedError

    def residuals_and_jacobians(self, params, data=None):
        params = tuple(params)

        def f(ps):
            return self.residuals(ps, data)

        res = f(params)
        jacs = jax.jacfwd(f)(params)
        return res, list(jacs)

    def check_shapes(self):
        assert self.num_residuals > 0
        assert all(s > 0 for s in self.parameter_block_sizes)


class AutoDiffCostFunction(CostFunction):
    """Wraps a jax functor ``f(*params, **{data}) -> residuals``.

    Analog of autodiff_cost_function.h:156 — but `kNumResiduals` /
    `Ns...` template params become plain ints, and differentiation +
    batching are deferred to jacfwd/vmap at trace time.
    """

    def __init__(
        self,
        functor: Callable,
        num_residuals: int,
        parameter_block_sizes: Sequence[int],
        name: Optional[str] = None,
    ):
        self.functor = functor
        self.num_residuals = int(num_residuals)
        self.parameter_block_sizes = tuple(int(s) for s in parameter_block_sizes)
        self.name = name or getattr(functor, "__name__", "autodiff_cost")
        self.check_shapes()

    def residuals(self, params, data=None):
        if data is None:
            out = self.functor(*params)
        else:
            out = self.functor(*params, data)
        out = jnp.atleast_1d(jnp.asarray(out))
        return out.reshape(self.num_residuals)


class AnalyticCostFunction(CostFunction):
    """For user-supplied closed-form Jacobians (SizedCostFunction subclassing
    analog). Subclass and override ``residuals`` and ``jacobians``."""

    def jacobians(self, params, data=None):
        raise NotImplementedError

    def residuals_and_jacobians(self, params, data=None):
        return self.residuals(params, data), list(self.jacobians(params, data))


class NumericDiffCostFunction(CostFunction):
    """Finite-difference Jacobians: FORWARD / CENTRAL / RIDDERS.

    Mirrors numeric_diff.h:61-208 semantics: per-coordinate step
    ``max(sqrt(eps), relative_step_size * |x_j|)``; Ridders does iterated
    Richardson extrapolation with a shrinking step
    (numeric_diff.h:121-208), done here with a static unrolled table so it
    stays jit/vmap friendly.
    """

    def __init__(
        self,
        functor: Callable,
        num_residuals: int,
        parameter_block_sizes: Sequence[int],
        method: "NumericDiffMethodType | str" = NumericDiffMethodType.CENTRAL,
        relative_step_size: float = 1e-6,
        ridders_relative_initial_step_size: float = 1e-2,
        max_num_ridders_extrapolations: int = 10,
        ridders_epsilon: float = 1e-12,
        ridders_step_shrink_factor: float = 2.0,
        name: Optional[str] = None,
    ):
        self.functor = functor
        self.num_residuals = int(num_residuals)
        self.parameter_block_sizes = tuple(int(s) for s in parameter_block_sizes)
        self.method = NumericDiffMethodType.parse(method)
        self.relative_step_size = relative_step_size
        self.ridders_relative_initial_step_size = ridders_relative_initial_step_size
        self.max_num_ridders_extrapolations = max_num_ridders_extrapolations
        self.ridders_epsilon = ridders_epsilon
        self.ridders_step_shrink_factor = ridders_step_shrink_factor
        self.name = name or getattr(functor, "__name__", "numeric_diff_cost")
        self.check_shapes()

    def residuals(self, params, data=None):
        if data is None:
            out = self.functor(*params)
        else:
            out = self.functor(*params, data)
        return jnp.atleast_1d(jnp.asarray(out)).reshape(self.num_residuals)

    def _eval_perturbed(self, params, data, block_idx, offsets_matrix):
        """Evaluate residuals at params with block `block_idx` perturbed by
        each row of offsets_matrix (K, size) -> (K, num_residuals)."""

        def one(offset):
            ps = list(params)
            ps[block_idx] = ps[block_idx] + offset
            return self.residuals(ps, data)

        return jax.vmap(one)(offsets_matrix)

    def residuals_and_jacobians(self, params, data=None):
        params = [jnp.asarray(p) for p in params]
        res = self.residuals(params, data)
        dtype = res.dtype
        min_step = float(np.sqrt(np.finfo(np.float64).eps))
        jacs = []
        for bi, size in enumerate(self.parameter_block_sizes):
            x = params[bi]
            if self.method == NumericDiffMethodType.RIDDERS:
                jacs.append(self._ridders_jacobian(params, data, bi, res))
                continue
            step = jnp.maximum(min_step, self.relative_step_size * jnp.abs(x))
            eye = jnp.eye(size, dtype=dtype)
            offsets = eye * step[None, :]
            f_plus = self._eval_perturbed(params, data, bi, offsets)  # (size, r)
            if self.method == NumericDiffMethodType.FORWARD:
                J = (f_plus - res[None, :]) / step[:, None]
            else:  # CENTRAL
                f_minus = self._eval_perturbed(params, data, bi, -offsets)
                J = (f_plus - f_minus) / (2.0 * step[:, None])
            jacs.append(J.T)  # (r, size)
        return res, jacs

    def _ridders_jacobian(self, params, data, block_idx, res):
        """Ridders' adaptive central-difference extrapolation
        (numeric_diff.h:121-208), statically unrolled: all candidate steps are
        evaluated (vmapped), then the Neville tableau is built and the entry
        with the smallest error estimate selected per column."""
        x = params[block_idx]
        size = self.parameter_block_sizes[block_idx]
        r = self.num_residuals
        m = self.max_num_ridders_extrapolations
        shrink = self.ridders_step_shrink_factor
        base_step = jnp.where(
            jnp.abs(x) > 0,
            jnp.abs(x) * self.ridders_relative_initial_step_size,
            self.ridders_relative_initial_step_size,
        )
        dtype = res.dtype
        eye = jnp.eye(size, dtype=dtype)
        # steps[k] = base_step / shrink^k; evaluate central diffs for all k.
        ks = jnp.asarray(shrink ** (-np.arange(m)), dtype=dtype)
        steps = base_step[None, :] * ks[:, None]  # (m, size)
        offs = steps[:, :, None] * eye[None, :, :]  # (m, size, size)
        offs_flat = offs.reshape(m * size, size)
        f_p = self._eval_perturbed(params, data, block_idx, offs_flat)
        f_m = self._eval_perturbed(params, data, block_idx, -offs_flat)
        central = (f_p - f_m).reshape(m, size, r) / (2.0 * steps[:, :, None])
        # Neville tableau per (coordinate, residual): T[i,0] = central[i],
        # T[i,j] = (4^j T[i, j-1] - T[i-1, j-1]) / (4^j - 1).
        big = jnp.finfo(dtype).max
        best = central[0]
        best_err = jnp.full((size, r), big, dtype=dtype)
        prev_row = central[0][None]  # tableau row i-1: (i, size, r)
        sq = shrink * shrink
        for i in range(1, m):
            row = [central[i]]
            for j in range(1, i + 1):
                fac = sq**j
                row.append((fac * row[j - 1] - prev_row[j - 1]) / (fac - 1.0))
            row_arr = jnp.stack(row)  # (i+1, size, r)
            # Error estimate: max |T[i,j] - T[i,j-1]|, |T[i,j] - T[i-1,j-1]|
            err_a = jnp.abs(row_arr[1:] - row_arr[:-1])
            err_b = jnp.abs(row_arr[1:] - prev_row)
            err = jnp.maximum(err_a, err_b)  # (i, size, r)
            cand_err = jnp.min(err, axis=0)
            cand_idx = jnp.argmin(err, axis=0)
            cand = jnp.take_along_axis(row_arr[1:], cand_idx[None], axis=0)[0]
            better = cand_err < best_err
            best = jnp.where(better, cand, best)
            best_err = jnp.where(better, cand_err, best_err)
            prev_row = row_arr
        return best.T.reshape(r, size) if best.shape != (size, r) else best.T


def cost_function_to_functor(cost: CostFunction) -> Callable:
    """CostFunctionToFunctor analog (cost_function_to_functor.h:156): in this
    framework any CostFunction already *is* a traceable functor, so nesting
    one inside another autodiff functor is a plain call."""

    def functor(*args):
        if len(args) == len(cost.parameter_block_sizes) + 1:
            *params, data = args
        else:
            params, data = args, None
        return cost.residuals(list(params), data)

    return functor


class ConditionedCostFunction(CostFunction):
    """Applies per-residual conditioner cost functions g_i to a wrapped cost
    function's residuals: r_i' = g_i(r_i) (conditioned_cost_function.cc)."""

    def __init__(self, wrapped: CostFunction, conditioners: Sequence[CostFunction]):
        if len(conditioners) != wrapped.num_residuals:
            raise ValueError("need one conditioner per residual")
        self.wrapped = wrapped
        self.conditioners = list(conditioners)
        self.num_residuals = wrapped.num_residuals
        self.parameter_block_sizes = wrapped.parameter_block_sizes

    def residuals(self, params, data=None):
        r = self.wrapped.residuals(params, data)
        out = [c.residuals([r[i : i + 1]], None)[0] for i, c in enumerate(self.conditioners)]
        return jnp.stack(out)


class NormalPrior(CostFunction):
    """r = A (x - b) (normal_prior.cc)."""

    def __init__(self, A, b):
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)
        self.num_residuals = self.A.shape[0]
        self.parameter_block_sizes = (self.b.shape[0],)

    def residuals(self, params, data=None):
        return self.A @ (params[0] - self.b)


def FirstOrderFunction(fn: Callable, num_parameters: int):
    """Helper mirroring first_order_function.h: fn(x)->scalar cost; gradient
    by reverse-mode AD (cheapest for scalar outputs on TPU)."""

    def cost_and_gradient(x):
        c, g = jax.value_and_grad(fn)(x)
        return c, g

    cost_and_gradient.num_parameters = num_parameters
    cost_and_gradient.fn = fn
    return cost_and_gradient
