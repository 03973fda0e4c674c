"""Fused line-search minimizer: the WHOLE LBFGS/BFGS/NCG/steepest-descent
loop in one XLA program.

TPU-native counterpart of the reference's line-search stack
(/root/reference/internal/ceres/line_search_minimizer.cc:87,
line_search.cc 884 LoC, line_search_direction.cc:342,
low_rank_inverse_hessian.cc:62): instead of the host loop in
solvers/line_search.py dispatching one jitted evaluation per probe (each
probe a device round-trip), the complete iteration

    direction (LBFGS two-loop / BFGS / NCG / steepest) -> Armijo or
    strong-Wolfe search (bracketing + zoom as inner while loops) ->
    update (curvature-pair push / dense BFGS update) -> tolerances

runs inside ONE `lax.while_loop` under a single jit.  Every line-search
probe evaluates cost AND the full gradient, so the accepted probe's
gradient IS the next iteration's gradient — no separate re-evaluation
after the search (the host loop pays one extra full evaluation per step).

Semantics preserved from the host loop: direction formulas (FR/PR/HS
beta, LBFGS two-loop with approximate-eigenvalue scaling, dense BFGS
update), descent-direction restarts, initial-step rules, Armijo
sufficient-decrease and strong-Wolfe curvature conditions, the
bracketing/zoom state machine, function/parameter/gradient tolerances,
termination taxonomy.  Interpolation parity: the Armijo search fits the
reference's exact {lowerbound, current, previous} polynomial window
(line_search.cc:245-267) via _interp_minimum3 (polynomial minimization
by grid+Newton instead of companion-matrix eigenvalues, which XLA lacks
on TPU); Wolfe bracketing/zoom use two-point interpolation exactly as
the reference does (line_search.cc:645-657, 800-813 pad the 3-sample
API with an invalid `previous`).  Remaining deviation: the zoom interval
is shrunk by a 1% margin before interpolation to avoid endpoint
stagnation, where the reference relies on its sample-comparison step.

LBFGS history buffers are fixed-size (max_lbfgs_rank, T) arrays with a
count — the XLA-static mirror of the reference's deque of vectors.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..options import Options
from ..summary import IterationSummary, Summary
from ..types import (
    LineSearchDirectionType,
    LineSearchInterpolationType,
    LineSearchType,
    NonlinearConjugateGradientType,
    TerminationType,
)

_RUNNING = 0
_GRADIENT_TOL = 1
_PARAM_TOL = 3
_FUNC_TOL = 4
_LS_FAIL = 7
_RESTARTS = 8


class _Sample(NamedTuple):
    """FunctionSample analog carried through the search loops."""

    s: jax.Array  # step size
    f: jax.Array  # phi(s)
    dphi: jax.Array  # phi'(s) = g(x+s d).d
    valid: jax.Array  # bool


def _interp_minimum(interp, s0: _Sample, s1: _Sample, lower, upper):
    """Minimizer of the interpolant through (s0: value+gradient,
    s1: value[+gradient]) clamped to [lower, upper]. Invalid samples /
    undefined closed forms fall back to the reference's contraction rule
    clip(0.5 * current.x) (line_search.cc:217-221), which is also the
    BISECTION behavior."""
    # current = the larger-x sample (the reference's upper_bound_step)
    half = jnp.clip(0.5 * jnp.maximum(s0.s, s1.s), lower, upper)
    if interp == LineSearchInterpolationType.BISECTION:
        return half
    x0, f0, g0 = s0.s, s0.f, s0.dphi
    x1, f1, g1 = s1.s, s1.f, s1.dphi
    dx = x1 - x0
    if interp == LineSearchInterpolationType.QUADRATIC:
        denom = 2.0 * (f1 - f0 - g0 * dx)
        cand = x0 - g0 * dx * dx / denom
        ok = jnp.isfinite(cand) & (jnp.abs(denom) > 0.0)
    else:  # CUBIC (two-point Hermite closed form)
        d1 = g0 + g1 - 3.0 * (f0 - f1) / jnp.where(dx == 0.0, 1.0, -dx)
        disc = d1 * d1 - g0 * g1
        d2 = jnp.sign(dx) * jnp.sqrt(jnp.maximum(disc, 0.0))
        denom = g1 - g0 + 2.0 * d2
        cand = x1 - dx * (g1 + d2 - d1) / jnp.where(denom == 0.0, 1.0, denom)
        ok = (disc >= 0.0) & (denom != 0.0) & jnp.isfinite(cand)
    ok = ok & s1.valid & jnp.isfinite(f1)
    cand = jnp.clip(cand, lower, upper)
    return jnp.where(ok, cand, half)


def _min_poly(coeffs, lower, upper, sample_xs):
    """Global minimizer of the polynomial (descending coeffs) on
    [lower, upper]: dense-grid seed + Newton polish on p', compared
    against the interval ends and the sample positions (the reference's
    MinimizePolynomial + sample comparison, polynomial.cc:374-392 —
    root isolation by grid+Newton instead of companion eigenvalues,
    which XLA lacks on TPU)."""
    d1 = jnp.polyder(coeffs)
    d2 = jnp.polyder(d1)
    ts = jnp.linspace(0.0, 1.0, 33)
    xs = lower + (upper - lower) * ts
    x = xs[jnp.argmin(jnp.polyval(coeffs, xs))]
    for _ in range(4):
        p1 = jnp.polyval(d1, x)
        p2 = jnp.polyval(d2, x)
        x = jnp.clip(
            jnp.where(jnp.abs(p2) > 0.0, x - p1 / p2, x), lower, upper)
    cands = jnp.concatenate([
        jnp.stack([x, lower, upper]),
        jnp.clip(sample_xs, lower, upper),
    ])
    vals = jnp.polyval(coeffs, cands)
    vals = jnp.where(jnp.isfinite(vals), vals, np.inf)
    return cands[jnp.argmin(vals)]


def _interp_minimum3(interp, s0: _Sample, s_prev: _Sample, s_cur: _Sample,
                     lower, upper):
    """Reference Armijo interpolation (line_search.cc:210-277): fit the
    exact degree-(#constraints-1) polynomial through {lowerbound
    (value+gradient), current, previous-if-valid} and minimize it on
    [lower, upper]. QUADRATIC uses values only for current/previous;
    CUBIC uses values+gradients. Falls back to the two-point closed form
    when previous is invalid or the Vandermonde solve degenerates."""
    two_pt = _interp_minimum(interp, s0, s_cur, lower, upper)
    if interp == LineSearchInterpolationType.BISECTION:
        return two_pt

    def fit(rows_x, rows_f, rows_g, use_grad):
        # constraints: value rows for every x, gradient rows where used
        n_val = len(rows_x)
        n = n_val + sum(use_grad)
        deg = n - 1
        A = []
        b = []
        for x, f in zip(rows_x, rows_f):
            A.append(jnp.stack([x ** (deg - j) for j in range(n)]))
            b.append(f)
        for x, g, u in zip(rows_x, rows_g, use_grad):
            if not u:
                continue
            A.append(jnp.stack(
                [(deg - j) * x ** jnp.maximum(deg - j - 1, 0)
                 if j < deg else jnp.zeros_like(x) for j in range(n)]))
            b.append(g)
        A = jnp.stack(A)
        b = jnp.stack(b)
        return jnp.linalg.solve(A, b)

    x0, xp, xc = s0.s, s_prev.s, s_cur.s
    if interp == LineSearchInterpolationType.QUADRATIC:
        coeffs = fit([x0, xc, xp], [s0.f, s_cur.f, s_prev.f],
                     [s0.dphi, 0.0, 0.0], [True, False, False])
    else:  # CUBIC
        coeffs = fit([x0, xc, xp], [s0.f, s_cur.f, s_prev.f],
                     [s0.dphi, s_cur.dphi, s_prev.dphi], [True, True, True])
    three_pt = _min_poly(coeffs, lower, upper, jnp.stack([x0, xc, xp]))
    ok = s_prev.valid & jnp.all(jnp.isfinite(coeffs)) & jnp.isfinite(three_pt)
    return jnp.where(ok, three_pt, two_pt)


class FusedLineSearchMinimizer:
    """One-jit line-search solve. Host involvement: one dispatch, then
    summary decoding (the analog of solvers/fused_lm.py for the
    LINE_SEARCH minimizer)."""

    def __init__(self, program, options: Options, summary: Summary):
        self.program = program
        self.options = options
        self.summary = summary
        self._fn = jax.jit(self._solve_impl)

    # -- device code ---------------------------------------------------------

    def _evaluate(self, x):
        o = self.program._eval_core(x, True, False)
        return (
            o["cost"].astype(jnp.float64),
            o["gradient"].astype(jnp.float64),
        )

    def _probe(self, x, d, s):
        """phi/phi' and the full gradient at x + s d."""
        xp = self.program._plus_impl(x, s * d)
        cost, grad = self._evaluate(xp)
        valid = jnp.isfinite(cost) & jnp.all(jnp.isfinite(grad))
        dphi = jnp.dot(grad, d)
        return _Sample(s=s, f=cost, dphi=dphi, valid=valid), grad

    # -- searches ------------------------------------------------------------

    def _armijo(self, x, d, step0, f0, dphi0, g0_vec=None):
        """ArmijoLineSearch (line_search.cc): backtracking with
        interpolation.  Returns (ok, sample, grad, evals)."""
        o = self.options
        c1 = o.line_search_sufficient_function_decrease
        max_it = int(o.max_num_line_search_step_size_iterations)
        initial = _Sample(
            s=jnp.asarray(0.0, jnp.float64), f=f0, dphi=dphi0,
            valid=jnp.asarray(True),
        )
        no_prev = _Sample(
            s=jnp.asarray(0.0, jnp.float64),
            f=jnp.asarray(np.inf, jnp.float64),
            dphi=jnp.asarray(0.0, jnp.float64), valid=jnp.asarray(False),
        )
        cur, grad = self._probe(x, d, step0)

        def needs_backtrack(c):
            return (~c.valid) | (c.f > f0 + c1 * c.s * c.dphi)

        def cond(st):
            i, prev, cur, grad, fail = st
            return (~fail) & needs_backtrack(cur)

        def body(st):
            i, prev, cur, grad, fail = st
            i = i + 1
            fail = i >= max_it
            lower = o.max_line_search_step_contraction * cur.s
            upper = o.min_line_search_step_contraction * cur.s
            # trailing-3 sample window (line_search.cc:325-336)
            new_s = _interp_minimum3(
                o.line_search_interpolation_type, initial, prev, cur,
                lower, upper
            )
            fail = fail | (new_s < o.min_line_search_step_size)
            nxt, ngrad = self._probe(x, d, jnp.maximum(new_s, 0.0))
            keep = fail
            prev = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, a, b), prev, cur
            )
            cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, a, b), cur, nxt
            )
            grad = jnp.where(keep, grad, ngrad)
            return (i, prev, cur, grad, fail)

        i, _, cur, grad, fail = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), no_prev, cur, grad,
                         jnp.asarray(False))
        )
        ok = (~fail) & (~needs_backtrack(cur))
        return ok, cur, grad, i + 1

    def _wolfe(self, x, d, step0, f0, dphi0, g0_vec=None):
        """WolfeLineSearch (line_search.cc): bracketing + zoom as one
        while loop with a phase flag.  Returns (ok, sample, grad, evals)."""
        o = self.options
        c1 = o.line_search_sufficient_function_decrease
        c2 = o.line_search_sufficient_curvature_decrease
        max_evals = int(o.max_num_line_search_step_size_iterations)
        interp = o.line_search_interpolation_type
        zero = jnp.asarray(0.0, jnp.float64)
        initial = _Sample(s=zero, f=f0, dphi=dphi0, valid=jnp.asarray(True))

        cur, cur_g = self._probe(x, d, step0)

        class _W(NamedTuple):
            phase: jax.Array  # 0 bracketing, 1 zoom
            is_first: jax.Array  # prev == initial
            prev: _Sample
            prev_g: jax.Array
            cur: _Sample
            cur_g: jax.Array
            lo: _Sample
            lo_g: jax.Array
            hi: _Sample
            hi_grad_ok: jax.Array
            evals: jax.Array
            done: jax.Array
            ok: jax.Array
            res: _Sample
            res_g: jax.Array

        gz = jnp.zeros_like(cur_g) if g0_vec is None else g0_vec
        st0 = _W(
            phase=jnp.asarray(0, jnp.int32), is_first=jnp.asarray(True),
            prev=initial, prev_g=gz, cur=cur, cur_g=cur_g,
            lo=initial, lo_g=gz, hi=initial, hi_grad_ok=jnp.asarray(True),
            evals=jnp.asarray(1, jnp.int32), done=jnp.asarray(False),
            ok=jnp.asarray(False), res=cur, res_g=cur_g,
        )

        def sel(c, a, b):
            return jax.tree_util.tree_map(
                lambda u, v: jnp.where(c, u, v), a, b
            )

        def bracket_step(w: _W) -> _W:
            cur, prev = w.cur, w.prev
            fails_armijo = (~cur.valid) | (
                cur.f > f0 + c1 * cur.s * dphi0
            ) | ((~w.is_first) & (cur.f >= prev.f))
            curvature_ok = (~fails_armijo) & (
                jnp.abs(cur.dphi) <= c2 * jnp.abs(dphi0)
            )
            derivative_up = (~fails_armijo) & (~curvature_ok) & (
                cur.dphi >= 0.0
            )
            out_of_evals = (~fails_armijo) & (~curvature_ok) & (
                ~derivative_up
            ) & (w.evals >= max_evals)
            expand = (~fails_armijo) & (~curvature_ok) & (~derivative_up) & (
                ~out_of_evals
            )

            # bracket: [prev, cur] when armijo fails, [cur, prev] when the
            # derivative turned positive
            lo = sel(fails_armijo, prev, cur)
            lo_g = jnp.where(fails_armijo, w.prev_g, w.cur_g)
            hi = sel(fails_armijo, cur, prev)
            to_zoom = fails_armijo | derivative_up
            # the hi end carries a usable gradient in both bracket cases
            nxt_s = cur.s * o.max_line_search_step_expansion
            probe_s = jnp.where(expand, nxt_s, cur.s)
            ncur, ncur_g = self._probe(x, d, probe_s)

            return _W(
                phase=jnp.where(to_zoom, 1, 0).astype(jnp.int32),
                is_first=w.is_first & ~expand,
                prev=sel(expand, cur, w.prev),
                prev_g=jnp.where(expand, w.cur_g, w.prev_g),
                cur=sel(expand, ncur, w.cur),
                cur_g=jnp.where(expand, ncur_g, w.cur_g),
                lo=sel(to_zoom, lo, w.lo),
                lo_g=jnp.where(to_zoom, lo_g, w.lo_g),
                hi=sel(to_zoom, hi, w.hi),
                hi_grad_ok=jnp.where(to_zoom, jnp.asarray(True),
                                     w.hi_grad_ok),
                evals=w.evals + jnp.where(expand, 1, 0).astype(jnp.int32),
                done=w.done | curvature_ok | out_of_evals,
                ok=w.ok | curvature_ok | (out_of_evals & cur.valid),
                res=sel(curvature_ok | out_of_evals, cur, w.res),
                res_g=jnp.where(curvature_ok | out_of_evals, w.cur_g,
                                w.res_g),
            )

        def zoom_step(w: _W) -> _W:
            lo, hi = w.lo, w.hi
            lower = jnp.minimum(lo.s, hi.s)
            upper = jnp.maximum(lo.s, hi.s)
            width_fail = (upper - lower) < o.min_line_search_step_size
            out_of_evals = w.evals >= max_evals
            stop = width_fail | out_of_evals
            margin = 0.01 * (upper - lower)
            hi_for_interp = _Sample(
                s=hi.s, f=hi.f,
                dphi=jnp.where(w.hi_grad_ok, hi.dphi, 0.0),
                valid=hi.valid & jnp.isfinite(hi.f) & w.hi_grad_ok,
            )
            new_s = _interp_minimum(
                interp, lo, hi_for_interp, lower + margin, upper - margin
            )
            trial, trial_g = self._probe(x, d, new_s)
            w = w._replace(evals=w.evals + jnp.where(stop, 0, 1))

            invalid = ~trial.valid
            shrinks_hi = trial.valid & (
                (trial.f > f0 + c1 * trial.s * dphi0) | (trial.f >= lo.f)
            )
            curvature_ok = trial.valid & (~shrinks_hi) & (
                jnp.abs(trial.dphi) <= c2 * jnp.abs(dphi0)
            )
            moves_lo = trial.valid & (~shrinks_hi) & (~curvature_ok)
            flip_hi = moves_lo & (trial.dphi * (hi.s - lo.s) >= 0.0)

            new_hi = sel(
                invalid,
                _Sample(s=new_s, f=jnp.asarray(np.inf, jnp.float64),
                        dphi=zero, valid=jnp.asarray(True)),
                sel(shrinks_hi, trial, sel(flip_hi, lo, hi)),
            )
            new_hi_grad_ok = jnp.where(
                invalid, jnp.asarray(False),
                jnp.where(shrinks_hi | flip_hi, jnp.asarray(True),
                          w.hi_grad_ok),
            )
            new_lo = sel(moves_lo, trial, lo)
            new_lo_g = jnp.where(moves_lo, trial_g, w.lo_g)

            fallback_ok = lo.valid & (lo.s > 0.0)
            done_now = stop | curvature_ok
            return w._replace(
                lo=sel(stop, w.lo, new_lo),
                lo_g=jnp.where(stop, w.lo_g, new_lo_g),
                hi=sel(stop, w.hi, new_hi),
                hi_grad_ok=jnp.where(stop, w.hi_grad_ok, new_hi_grad_ok),
                done=w.done | done_now,
                ok=w.ok | jnp.where(stop, fallback_ok, curvature_ok),
                res=sel(done_now, sel(stop, lo, trial), w.res),
                res_g=jnp.where(done_now,
                                jnp.where(stop, w.lo_g, trial_g), w.res_g),
            )

        def cond(w: _W):
            return ~w.done

        def body(w: _W):
            wb = bracket_step(w)
            wz = zoom_step(w)
            return sel(w.phase == 0, wb, wz)

        w = jax.lax.while_loop(cond, body, st0)
        return w.ok, w.res, w.res_g, w.evals

    # -- the fused outer loop -------------------------------------------------

    def _solve_impl(self, x0):
        prog, opts = self.program, self.options
        T = prog.tangent_size
        dtype = jnp.float64
        max_iters = int(opts.max_num_iterations)
        dt = opts.line_search_direction_type
        use_wolfe = opts.line_search_type == LineSearchType.WOLFE
        search = self._wolfe if use_wolfe else self._armijo
        m = int(opts.max_lbfgs_rank) if (
            dt == LineSearchDirectionType.LBFGS
        ) else 1
        use_bfgs = dt == LineSearchDirectionType.BFGS
        Tb = T if use_bfgs else 1

        cost0, grad0 = self._evaluate(x0)
        gnorm2_0 = jnp.dot(grad0, grad0)

        H = max_iters + 1
        z64 = jnp.zeros((H,), dtype)

        class _C(NamedTuple):
            x: jax.Array
            cost: jax.Array
            grad: jax.Array
            gnorm2: jax.Array
            prev_grad: jax.Array
            prev_dir: jax.Array
            prev_step: jax.Array
            prev_descent: jax.Array
            have_prev: jax.Array
            S: jax.Array  # (m, T) LBFGS curvature pairs, oldest first
            Y: jax.Array
            rho: jax.Array
            cnt: jax.Array
            hscale: jax.Array
            bfgs_H: jax.Array  # (Tb, Tb)
            bfgs_init: jax.Array
            restarts: jax.Array
            it: jax.Array
            term: jax.Array
            evals_total: jax.Array
            hist_cost: jax.Array
            hist_gnorm: jax.Array
            hist_gmax: jax.Array
            hist_step: jax.Array
            hist_evals: jax.Array

        gmax0 = jnp.max(jnp.abs(grad0)) if T else jnp.asarray(0.0)
        term0 = jnp.where(
            gmax0 <= opts.gradient_tolerance, _GRADIENT_TOL, _RUNNING
        ).astype(jnp.int32)

        c0 = _C(
            x=x0.astype(dtype), cost=cost0, grad=grad0, gnorm2=gnorm2_0,
            prev_grad=jnp.zeros((T,), dtype),
            prev_dir=jnp.zeros((T,), dtype),
            prev_step=jnp.asarray(0.0, dtype),
            prev_descent=jnp.asarray(0.0, dtype),
            have_prev=jnp.asarray(False),
            S=jnp.zeros((m, T), dtype), Y=jnp.zeros((m, T), dtype),
            rho=jnp.zeros((m,), dtype), cnt=jnp.asarray(0, jnp.int32),
            hscale=jnp.asarray(1.0, dtype),
            bfgs_H=jnp.eye(Tb, dtype=dtype),
            bfgs_init=jnp.asarray(False),
            restarts=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32), term=term0,
            evals_total=jnp.asarray(1, jnp.int32),
            hist_cost=z64.at[0].set(cost0),
            hist_gnorm=z64.at[0].set(jnp.sqrt(gnorm2_0)),
            hist_gmax=z64.at[0].set(gmax0),
            hist_step=z64,
            hist_evals=jnp.zeros((H,), jnp.int32),
        )

        def lbfgs_apply(s: _C, g):
            """Two-loop recursion over the fixed-size buffers
            (low_rank_inverse_hessian.cc:62)."""
            q = g
            alphas = [None] * m
            live = lambda j: j < s.cnt  # noqa: E731
            for j in reversed(range(m)):
                a = s.rho[j] * jnp.dot(s.S[j], q)
                a = jnp.where(live(j), a, 0.0)
                alphas[j] = a
                q = q - a * s.Y[j]
            apply_scale = (
                s.cnt > 0
                if not opts.use_approximate_eigenvalue_bfgs_scaling
                else jnp.asarray(True)
            )
            q = jnp.where(apply_scale, q * s.hscale, q)
            for j in range(m):
                b = s.rho[j] * jnp.dot(s.Y[j], q)
                b = jnp.where(live(j), b, 0.0)
                q = q + (alphas[j] - b) * s.S[j]
            return q

        def body(s: _C):
            it = s.it + 1
            g = s.grad

            # ---- direction (line_search_direction.cc:342) ----------------
            if dt == LineSearchDirectionType.STEEPEST_DESCENT:
                direction = -g
            elif dt == LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT:
                t = opts.nonlinear_conjugate_gradient_type
                gg_prev = jnp.dot(s.prev_grad, s.prev_grad)
                safe = jnp.where(gg_prev == 0.0, 1.0, gg_prev)
                if t == NonlinearConjugateGradientType.FLETCHER_REEVES:
                    beta = s.gnorm2 / safe
                elif t == NonlinearConjugateGradientType.POLAK_RIBIERE:
                    beta = jnp.dot(g, g - s.prev_grad) / safe
                else:  # HESTENES_STIEFEL
                    dy = g - s.prev_grad
                    dd = jnp.dot(s.prev_dir, dy)
                    beta = jnp.dot(g, dy) / jnp.where(
                        jnp.abs(dd) < 1e-300, 1e-300, dd
                    )
                ncg = -g + jnp.maximum(beta, 0.0) * s.prev_dir
                direction = jnp.where(s.have_prev, ncg, -g)
            elif dt == LineSearchDirectionType.LBFGS:
                direction = jnp.where(
                    s.have_prev, -lbfgs_apply(s, g), -g
                )
            else:  # BFGS
                direction = jnp.where(s.have_prev, -(s.bfgs_H @ g), -g)

            descent = jnp.dot(direction, g)
            needs_restart = descent >= 0.0
            restarts = s.restarts + jnp.where(needs_restart, 1, 0)
            restart_fail = needs_restart & (
                restarts > opts.max_num_line_search_direction_restarts
            )
            direction = jnp.where(needs_restart, -g, direction)
            descent = jnp.where(needs_restart, -s.gnorm2, descent)

            # ---- initial step (line_search_minimizer.cc) ------------------
            gmax = jnp.max(jnp.abs(g))
            first = ~s.have_prev
            s_first = jnp.minimum(1.0, 1.0 / jnp.maximum(gmax, 1e-300))
            s_later = jnp.where(
                descent != 0.0,
                jnp.minimum(
                    1.0, 1.05 * s.prev_step * s.prev_descent / descent
                ),
                1.0,
            )
            step0 = jnp.where(first, s_first, s_later)
            step0 = jnp.maximum(step0, opts.min_line_search_step_size)

            ok, res, res_g, evals = search(
                s.x, direction, step0, s.cost, descent, g
            )
            ok = ok & ~restart_fail

            # ---- update ---------------------------------------------------
            new_x = prog._plus_impl(s.x, res.s * direction)
            new_cost, new_grad = res.f, res_g
            step_vec = res.s * direction
            step_norm = jnp.linalg.norm(step_vec)
            delta_cost = s.cost - new_cost

            # LBFGS curvature pair (low_rank_inverse_hessian.cc update)
            dg = new_grad - g
            sy = jnp.dot(step_vec, dg)
            push = ok & (sy > 1e-10)
            if dt == LineSearchDirectionType.LBFGS:
                full = s.cnt == m
                Sb = jnp.where(full, jnp.roll(s.S, -1, axis=0), s.S)
                Yb = jnp.where(full, jnp.roll(s.Y, -1, axis=0), s.Y)
                rb = jnp.where(full, jnp.roll(s.rho, -1), s.rho)
                idx = jnp.minimum(s.cnt, m - 1)
                Sb = Sb.at[idx].set(step_vec)
                Yb = Yb.at[idx].set(dg)
                rb = rb.at[idx].set(1.0 / jnp.where(sy == 0.0, 1.0, sy))
                S_new = jnp.where(push, Sb, s.S)
                Y_new = jnp.where(push, Yb, s.Y)
                rho_new = jnp.where(push, rb, s.rho)
                cnt_new = jnp.where(push, jnp.minimum(s.cnt + 1, m), s.cnt)
                hscale_new = jnp.where(
                    push, sy / jnp.maximum(jnp.dot(dg, dg), 1e-300),
                    s.hscale,
                )
            else:
                S_new, Y_new, rho_new = s.S, s.Y, s.rho
                cnt_new, hscale_new = s.cnt, s.hscale

            if use_bfgs:
                scale0 = sy / jnp.maximum(jnp.dot(dg, dg), 1e-300)
                Hb = jnp.where(
                    push & ~s.bfgs_init, s.bfgs_H * scale0, s.bfgs_H
                )
                rho_b = 1.0 / jnp.where(sy == 0.0, 1.0, sy)
                V = jnp.eye(T, dtype=dtype) - rho_b * jnp.outer(step_vec, dg)
                Hu = V @ Hb @ V.T + rho_b * jnp.outer(step_vec, step_vec)
                bfgs_H_new = jnp.where(push, Hu, s.bfgs_H)
                bfgs_init_new = s.bfgs_init | push
            else:
                bfgs_H_new, bfgs_init_new = s.bfgs_H, s.bfgs_init

            new_gnorm2 = jnp.dot(new_grad, new_grad)
            new_gmax = jnp.max(jnp.abs(new_grad))

            # ---- termination ---------------------------------------------
            term = jnp.where(
                restart_fail, _RESTARTS, jnp.where(~ok, _LS_FAIL, _RUNNING)
            )
            x_norm = jnp.linalg.norm(new_x)
            func_hit = ok & (
                jnp.abs(delta_cost)
                <= opts.function_tolerance * jnp.maximum(new_cost, 1e-300)
            )
            ptol = opts.parameter_tolerance
            param_hit = ok & (~func_hit) & (
                step_norm <= ptol * (x_norm + ptol)
            )
            grad_hit = ok & (~func_hit) & (~param_hit) & (
                new_gmax <= opts.gradient_tolerance
            )
            term = jnp.where(
                term == _RUNNING,
                jnp.where(
                    func_hit, _FUNC_TOL,
                    jnp.where(param_hit, _PARAM_TOL,
                              jnp.where(grad_hit, _GRADIENT_TOL, _RUNNING)),
                ),
                term,
            ).astype(jnp.int32)

            accept = ok
            x_new = jnp.where(accept, new_x, s.x)
            cost_new = jnp.where(accept, new_cost, s.cost)
            grad_new = jnp.where(accept, new_grad, s.grad)
            gnorm2_new = jnp.where(accept, new_gnorm2, s.gnorm2)
            evals_total = s.evals_total + evals

            return _C(
                x=x_new, cost=cost_new, grad=grad_new, gnorm2=gnorm2_new,
                prev_grad=jnp.where(accept, g, s.prev_grad),
                prev_dir=jnp.where(accept, direction, s.prev_dir),
                prev_step=jnp.where(accept, res.s, s.prev_step),
                prev_descent=jnp.where(accept, descent, s.prev_descent),
                have_prev=s.have_prev | accept,
                S=S_new, Y=Y_new, rho=rho_new, cnt=cnt_new,
                hscale=hscale_new, bfgs_H=bfgs_H_new,
                bfgs_init=bfgs_init_new,
                restarts=restarts, it=it, term=term,
                evals_total=evals_total,
                hist_cost=s.hist_cost.at[it].set(cost_new),
                hist_gnorm=s.hist_gnorm.at[it].set(jnp.sqrt(gnorm2_new)),
                hist_gmax=s.hist_gmax.at[it].set(
                    jnp.where(accept, new_gmax, s.hist_gmax[s.it])
                ),
                hist_step=s.hist_step.at[it].set(
                    jnp.where(accept, step_norm, 0.0)
                ),
                hist_evals=s.hist_evals.at[it].set(evals_total),
            )

        def cond(s: _C):
            return (s.term == _RUNNING) & (s.it < max_iters)

        out = jax.lax.while_loop(cond, body, c0)
        # pack into three outputs: extra jit output leaves each cost a
        # runtime round trip on tunneled backends
        scalars = jnp.stack([
            out.cost, out.it.astype(jnp.float64),
            out.term.astype(jnp.float64),
        ])
        hist_mat = jnp.stack([
            out.hist_cost, out.hist_gnorm, out.hist_gmax, out.hist_step,
            out.hist_evals.astype(jnp.float64),
        ])
        return out.x, scalars, hist_mat

    # -- host wrapper ---------------------------------------------------------

    def minimize(self, x0):
        opts = self.options
        summary = self.summary
        t0 = time.monotonic()
        x, scalars, hist_mat = self._fn(jnp.asarray(x0))
        x = jax.block_until_ready(x)
        elapsed = time.monotonic() - t0

        scalars = np.asarray(scalars)
        hm = np.asarray(hist_mat)
        h_cost, h_gnorm, h_gmax, h_step = hm[0], hm[1], hm[2], hm[3]
        h_evals = hm[4].astype(np.int64)
        n_it = int(scalars[1])
        term = int(scalars[2])
        self.x_cost = float(scalars[0])
        summary.initial_cost = float(h_cost[0])

        # the host loop appends a row per loop-top visit: terminal rows for
        # mid-iteration breaks (func/param tol, search failure) are omitted
        last_row = n_it
        if term in (_FUNC_TOL, _PARAM_TOL, _LS_FAIL, _RESTARTS):
            last_row = max(0, n_it - 1)
        for i in range(last_row + 1):
            summary.iterations.append(IterationSummary(
                iteration=i,
                cost=float(h_cost[i]),
                gradient_norm=float(h_gnorm[i]),
                gradient_max_norm=float(h_gmax[i]),
                step_norm=float(h_step[i]),
                step_is_valid=True,
                step_is_successful=True,
                line_search_function_evaluations=int(h_evals[i]),
            ))
        fail_steps = 1 if term in (_LS_FAIL, _RESTARTS) else 0
        summary.num_successful_steps += max(0, n_it - fail_steps)
        summary.num_line_search_steps += int(h_evals[n_it])
        summary.num_residual_evaluations += int(h_evals[n_it]) + 1
        summary.num_gradient_evaluations += int(h_evals[n_it]) + 1
        summary.minimizer_time_in_seconds = elapsed

        if term == _GRADIENT_TOL:
            summary.message = (
                "Gradient tolerance reached. Gradient max norm: "
                f"{float(h_gmax[n_it]):e} <= {opts.gradient_tolerance:e}"
            )
            summary.termination_type = TerminationType.CONVERGENCE
        elif term == _FUNC_TOL:
            summary.message = (
                "Function tolerance reached. |cost_change|/cost <= "
                f"{opts.function_tolerance:e}"
            )
            summary.termination_type = TerminationType.CONVERGENCE
        elif term == _PARAM_TOL:
            summary.message = "Parameter tolerance reached."
            summary.termination_type = TerminationType.CONVERGENCE
        elif term == _LS_FAIL:
            summary.message = (
                "Numerical failure in line search: failed to find a valid "
                "step."
            )
            summary.termination_type = TerminationType.NO_CONVERGENCE
        elif term == _RESTARTS:
            summary.message = (
                "Line search direction failure: exceeded "
                "max_num_line_search_direction_restarts."
            )
            summary.termination_type = TerminationType.NO_CONVERGENCE
        else:
            summary.message = (
                "Maximum number of iterations reached. "
                f"Number of iterations: {n_it}."
            )
            summary.termination_type = TerminationType.NO_CONVERGENCE
        return x


def build_fused_line_search(program, options: Options, summary: Summary):
    """Factory mirroring solver._maybe_build_fused: None -> host loop."""
    mode = options.fused_loop.upper()
    if mode == "NEVER":
        return None
    num_res = getattr(program, "num_residuals", 0)
    if mode == "AUTO" and num_res < options.fused_loop_min_residuals:
        return None
    if (
        options.callbacks
        or options.update_state_every_iteration
        or options.evaluation_callback is not None
        or options.max_solver_time_in_seconds < 1e6
    ):
        return None
    cache = getattr(program, "_minimizer_cache", None)
    if cache is not None:
        from ..solver import _options_fingerprint

        key = ("line_search", _options_fingerprint(options))
        m = cache.get(key)
        if m is None:
            m = FusedLineSearchMinimizer(program, options, summary)
            cache[key] = m
        else:
            m.summary = summary  # fresh summary per solve; jitted loop reused
        return m
    return FusedLineSearchMinimizer(program, options, summary)
