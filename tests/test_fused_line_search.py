"""Fused one-jit line-search minimizer (solvers/fused_line_search.py) vs
the host-loop minimizer across direction x search configurations.

Mirrors the reference's line_search_minimizer tests: every configuration
must reach the same minima as the trusted host configuration."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.gradient_problem import GradientProblem, solve_gradient_problem


def rosenbrock_gp():
    def cost(xy):
        x, y = xy[0], xy[1]
        return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2

    return GradientProblem(cost, 2)


def _solve_gp(fused: str, **kw):
    x = np.asarray([-1.2, 1.0])
    base = dict(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                max_num_iterations=300, fused_loop=fused)
    base.update(kw)
    s = solve_gradient_problem(ct.Options(**base), rosenbrock_gp(), x)
    return x, s


@pytest.mark.parametrize("direction", ["LBFGS", "BFGS",
                                       "NONLINEAR_CONJUGATE_GRADIENT",
                                       "STEEPEST_DESCENT"])
@pytest.mark.parametrize("search", ["WOLFE", "ARMIJO"])
def test_fused_matches_host_rosenbrock(direction, search):
    kw = dict(
        line_search_direction_type=ct.LineSearchDirectionType[direction],
        line_search_type=ct.LineSearchType[search],
    )
    if direction in ("BFGS", "LBFGS") and search == "ARMIJO":
        return  # rejected by options validation (reference semantics)
    xh, host = _solve_gp("NEVER", **kw)
    xf, fused = _solve_gp("ALWAYS", **kw)
    if direction in ("STEEPEST_DESCENT",) or search == "ARMIJO":
        # slow/chaotic configs on Rosenbrock: trajectories track closely for
        # the first dozen iterations then diverge chaotically — require
        # comparable progress, not identical minima
        assert fused.final_cost < host.iterations[0].cost * 0.2
        return
    assert host.final_cost < 1e-10
    assert fused.final_cost < 1e-10, (
        f"fused {direction}/{search} cost={fused.final_cost}"
    )
    np.testing.assert_allclose(xf, [1.0, 1.0], atol=1e-4)


@pytest.mark.parametrize("ncg", ["FLETCHER_REEVES", "POLAK_RIBIERE",
                                 "HESTENES_STIEFEL"])
def test_fused_ncg_variants(ncg):
    kw = dict(
        line_search_direction_type=(
            ct.LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT),
        nonlinear_conjugate_gradient_type=(
            ct.NonlinearConjugateGradientType[ncg]),
    )
    _, host = _solve_gp("NEVER", **kw)
    _, fused = _solve_gp("ALWAYS", **kw)
    # PR legitimately stalls on Rosenbrock (host and fused stall at the
    # same direction-restart failure); FR/HS converge
    assert fused.termination_type == host.termination_type
    assert fused.final_cost == pytest.approx(host.final_cost, rel=0.5, abs=1e-8)


def test_fused_interpolation_types():
    for interp in ("BISECTION", "QUADRATIC", "CUBIC"):
        _, s = _solve_gp(
            "ALWAYS",
            line_search_interpolation_type=(
                ct.LineSearchInterpolationType[interp]),
        )
        assert s.final_cost < 1e-8, interp


def test_fused_line_search_nlls_problem():
    """LINE_SEARCH minimizer on a residual problem through ct.solve."""
    rng = np.random.default_rng(0)
    xs = np.linspace(0, 3, 40)
    ys = np.exp(0.3 * xs + 0.1) + 0.001 * rng.standard_normal(40)

    def f(mc, data):
        x, y = data
        return y - jnp.exp(mc[0] * x + mc[1])

    cost = ct.AutoDiffCostFunction(f, 1, [2])

    def build():
        mc = np.array([0.0, 0.0])
        p = ct.Problem()
        for x, y in zip(xs, ys):
            p.add_residual_block(cost, None, [mc],
                                 data=(np.float64(x), np.float64(y)))
        return p, mc

    p1, mc1 = build()
    host = ct.solve(
        ct.Options(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                   fused_loop="NEVER", max_num_iterations=200), p1)
    p2, mc2 = build()
    fused = ct.solve(
        ct.Options(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                   fused_loop="ALWAYS", max_num_iterations=200), p2)
    assert fused.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-4,
                                             abs=1e-12)
    np.testing.assert_allclose(mc2, mc1, atol=1e-4)


def test_fused_gradient_problem_with_manifold():
    from ceres_tpu import rotation as rot

    target = jnp.asarray([0.0, 0.0, 1.0])

    def cost(q):
        v = rot.unit_quaternion_rotate_point(q, jnp.asarray([1.0, 0.0, 0.0]))
        return jnp.sum((v - target) ** 2)

    q = np.asarray([1.0, 0.0, 0.0, 0.0])
    gp = GradientProblem(cost, 4, manifold=ct.QuaternionManifold())
    s = solve_gradient_problem(
        ct.Options(minimizer_type=ct.MinimizerType.LINE_SEARCH,
                   fused_loop="ALWAYS", max_num_iterations=200),
        gp, q,
    )
    assert s.final_cost < 1e-12
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)


def test_fused_max_iterations():
    _, s = _solve_gp("ALWAYS", max_num_iterations=3)


def _solve_gp_kw(fused, **kw):
    return _solve_gp(fused, **kw)


def test_fused_termination_messages():
    _, s = _solve_gp("ALWAYS")
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.message


@pytest.mark.parametrize("interp", ["CUBIC", "QUADRATIC", "BISECTION"])
def test_armijo_three_point_interpolation_parity(interp):
    """The fused Armijo trailing-3 interpolation (line_search.cc:245-267
    window {lowerbound, current, previous}) tracks the host loop
    iteration-by-iteration on a smooth convex problem."""
    def cost(v):
        x, y = v[0], v[1]
        return (x - 1.0) ** 4 + 10.0 * (y + 2.0) ** 4 + 0.5 * x * x + y * y

    kw = dict(
        minimizer_type=ct.MinimizerType.LINE_SEARCH,
        line_search_direction_type=(
            ct.LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT),
        line_search_type=ct.LineSearchType.ARMIJO,
        line_search_interpolation_type=(
            ct.LineSearchInterpolationType[interp]),
        max_num_iterations=25,
    )
    xh = np.asarray([4.0, 3.0])
    host = solve_gradient_problem(
        ct.Options(fused_loop="NEVER", **kw), GradientProblem(cost, 2), xh)
    xf = np.asarray([4.0, 3.0])
    fused = solve_gradient_problem(
        ct.Options(fused_loop="ALWAYS", **kw), GradientProblem(cost, 2), xf)
    n = min(len(host.iterations), len(fused.iterations), 12)
    for ih, if_ in zip(host.iterations[:n], fused.iterations[:n]):
        assert if_.cost == pytest.approx(ih.cost, rel=1e-6, abs=1e-10), (
            f"iter {ih.iteration}: host {ih.cost} fused {if_.cost}")
