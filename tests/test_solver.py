"""End-to-end solver tests (reference system_test.cc / solver_test.cc /
trust_region_minimizer_test.cc patterns)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct


def make_powell():
    x1 = np.asarray([3.0])
    x2 = np.asarray([-1.0])
    x3 = np.asarray([0.0])
    x4 = np.asarray([1.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda a, b: a[0] + 10 * b[0], 1, [1, 1]), None, [x1, x2]
    )
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda a, b: jnp.sqrt(5.0) * (a[0] - b[0]), 1, [1, 1]),
        None,
        [x3, x4],
    )
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda a, b: (a[0] - 2 * b[0]) ** 2, 1, [1, 1]),
        None,
        [x2, x3],
    )
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda a, b: jnp.sqrt(10.0) * (a[0] - b[0]) ** 2, 1, [1, 1]),
        None,
        [x1, x4],
    )
    return p, (x1, x2, x3, x4)


@pytest.mark.parametrize(
    "lst", ["DENSE_QR", "DENSE_NORMAL_CHOLESKY"]
)
def test_powell_converges(lst):
    p, xs = make_powell()
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType.parse(lst), max_num_iterations=100
    )
    s = ct.solve(opts, p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < 1e-10
    for x in xs:
        assert abs(x[0]) < 1e-2


def test_powell_mixed_precision():
    p, xs = make_powell()
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
        use_mixed_precision_solves=True,
        max_num_refinement_iterations=3,
        max_num_iterations=100,
    )
    s = ct.solve(opts, p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < 1e-8


def test_curve_fitting_matches_truth():
    rng = np.random.default_rng(0)
    xs = np.linspace(0, 5, 67)
    ys = np.exp(0.3 * xs + 0.1) + 0.2 * rng.standard_normal(67)
    cost = ct.AutoDiffCostFunction(
        lambda mc, d: d[1] - jnp.exp(mc[0] * d[0] + mc[1]), 1, [2]
    )
    mc = np.zeros(2)
    p = ct.Problem()
    for x, y in zip(xs, ys):
        p.add_residual_block(cost, None, [mc], data=(np.float64(x), np.float64(y)))
    s = ct.solve(ct.Options(max_num_iterations=50), p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(mc[0] - 0.3) < 0.05 and abs(mc[1] - 0.1) < 0.1


def test_bounds_clamp_solution():
    v = np.asarray([5.0])
    p = ct.Problem()
    p.add_residual_block(ct.AutoDiffCostFunction(lambda v: v - 1.0, 1, [1]), None, [v])
    p.set_parameter_lower_bound(v, 0, 2.0)
    s = ct.solve(ct.Options(max_num_iterations=50), p)
    assert s.is_solution_usable()
    np.testing.assert_allclose(v, [2.0], atol=1e-10)
    assert s.is_constrained


def test_robust_loss_rejects_outliers():
    rng = np.random.default_rng(1)
    xs = np.linspace(0, 5, 50)
    ys = 2.0 * xs + 1.0 + 0.05 * rng.standard_normal(50)
    ys[::10] += 20.0
    cost = ct.AutoDiffCostFunction(lambda ab, d: d[1] - (ab[0] * d[0] + ab[1]), 1, [2])
    ab = np.zeros(2)
    p = ct.Problem()
    for x, y in zip(xs, ys):
        p.add_residual_block(cost, ct.CauchyLoss(0.5), [ab], data=(np.float64(x), np.float64(y)))
    ct.solve(ct.Options(max_num_iterations=50), p)
    assert abs(ab[0] - 2.0) < 0.05 and abs(ab[1] - 1.0) < 0.1


def test_quaternion_manifold_solve():
    q = np.asarray([1.0, 0.0, 0.0, 0.0])
    target = np.asarray([np.cos(0.5), np.sin(0.5), 0.0, 0.0])
    p = ct.Problem()
    p.add_parameter_block(q, manifold=ct.QuaternionManifold())
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda q: q - jnp.asarray(target), 4, [4]), None, [q]
    )
    s = ct.solve(ct.Options(max_num_iterations=50), p)
    assert s.final_cost < 1e-15
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)


def test_callbacks_and_termination():
    calls = []

    def cb(it):
        calls.append(it.iteration)
        if it.iteration >= 2:
            return ct.CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY
        return ct.CallbackReturnType.SOLVER_CONTINUE

    p, _ = make_powell()
    opts = ct.Options(callbacks=[cb], max_num_iterations=100)
    s = ct.solve(opts, p)
    assert s.termination_type == ct.TerminationType.USER_SUCCESS
    assert calls == [0, 1, 2]


def test_callback_abort():
    p, _ = make_powell()
    opts = ct.Options(
        callbacks=[lambda it: ct.CallbackReturnType.SOLVER_ABORT], max_num_iterations=10
    )
    s = ct.solve(opts, p)
    assert s.termination_type == ct.TerminationType.USER_FAILURE
    assert not s.is_solution_usable()


def test_max_iterations_no_convergence():
    p, _ = make_powell()
    s = ct.solve(ct.Options(max_num_iterations=1), p)
    assert s.termination_type == ct.TerminationType.NO_CONVERGENCE
    assert s.is_solution_usable()


def test_summary_provenance():
    p, _ = make_powell()
    opts = ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_QR)
    s = ct.solve(opts, p)
    assert s.num_parameter_blocks == 4
    assert s.num_residual_blocks == 4
    assert s.num_parameters_reduced == 4
    assert s.linear_solver_type_given == ct.LinearSolverType.DENSE_QR
    assert s.num_successful_steps + s.num_unsuccessful_steps == len(s.iterations)
    assert "Solver Summary" in s.full_report()
    assert s.iterations[0].cost == pytest.approx(s.initial_cost)


def test_nonmonotonic_steps():
    p, _ = make_powell()
    s = ct.solve(
        ct.Options(use_nonmonotonic_steps=True, max_num_iterations=100), p
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < 1e-10


def test_fixed_cost_in_summary():
    p = ct.Problem()
    x = np.asarray([2.0])
    y = np.asarray([4.0])
    c = ct.AutoDiffCostFunction(lambda v: v - 1.0, 1, [1])
    p.add_residual_block(c, None, [x])
    p.add_residual_block(c, None, [y])
    p.set_parameter_block_constant(y)
    s = ct.solve(ct.Options(), p)
    np.testing.assert_allclose(s.fixed_cost, 0.5 * 9.0)
    np.testing.assert_allclose(s.final_cost, 0.5 * 9.0, atol=1e-10)


def test_rosenbrock_trust_region():
    # More-Garbow-Hillstrom #1 (trust_region_minimizer_test.cc pattern).
    xy = np.asarray([-1.2, 1.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(
            lambda v: jnp.stack([10.0 * (v[1] - v[0] ** 2), 1.0 - v[0]]), 2, [2]
        ),
        None,
        [xy],
    )
    s = ct.solve(ct.Options(max_num_iterations=200), p)
    assert s.final_cost < 1e-12
    np.testing.assert_allclose(xy, [1.0, 1.0], atol=1e-5)


def test_evaluation_dtype_float32():
    """f32 evaluation (TPU-native) reaches the f64 final cost within f32
    tolerance on a BA problem; state stays f64."""
    from ceres_tpu.models import bal

    def make():
        b = bal.synthetic_bal(num_cameras=6, num_points=50, visibility=0.5,
                              noise=0.1, seed=3)
        bp = bal.perturb(b, 0.01, 0.05, 0.05)
        return bal.build_problem_batched(bp)[0]

    s64 = ct.solve(ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                              max_num_iterations=40), make())
    s32 = ct.solve(ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                              max_num_iterations=40,
                              evaluation_dtype="float32"), make())
    assert s32.is_solution_usable()
    assert abs(s32.final_cost - s64.final_cost) < 1e-3 * max(1.0, s64.final_cost)


def test_dynamic_sparsity_matches_static():
    """Options::dynamic_sparsity re-runs the symbolic analysis per solve on
    the pruned numeric pattern (dynamic_sparse_normal_cholesky_solver.cc).
    The Jacobian here has value-dependent zeros (a ReLU-style coupling
    inactive at the start), so the dynamic pattern is a strict subset of
    the block pattern; solutions must agree."""
    def build():
        xs = [np.asarray([2.0 + i]) for i in range(6)]
        p = ct.Problem()
        for i in range(5):
            p.add_residual_block(
                ct.AutoDiffCostFunction(
                    lambda a, b: a[0] - 2.0 * b[0] + 1.0, 1, [1, 1]),
                None, [xs[i], xs[i + 1]],
            )
            # coupling whose db-derivative is exactly zero where b < 0
            p.add_residual_block(
                ct.AutoDiffCostFunction(
                    lambda a, b: a[0] + jnp.maximum(b[0], 0.0) ** 2,
                    1, [1, 1]),
                None, [xs[i], xs[(i + 3) % 6]],
            )
        return p, xs

    kw = dict(linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
              max_num_iterations=40)
    p1, _ = build()
    s_static = ct.solve(ct.Options(**kw), p1)
    p2, _ = build()
    s_dyn = ct.solve(ct.Options(dynamic_sparsity=True, **kw), p2)
    assert s_dyn.is_solution_usable()
    assert s_dyn.final_cost == pytest.approx(s_static.final_cost,
                                             rel=1e-8, abs=1e-12)


def test_dynamic_sparsity_requires_sparse_normal_cholesky():
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_QR,
                   dynamic_sparsity=True),
        make_powell()[0],
    )
    assert s.termination_type == ct.TerminationType.FAILURE
