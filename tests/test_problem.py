"""Problem API tests (reference problem_test.cc, 2313 LoC — the core
behaviors: add/remove, constants, bounds, evaluate)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.program import CompiledProgram


def quad_cost():
    return ct.AutoDiffCostFunction(lambda x: x - 1.0, 2, [2])


def test_add_residual_block_counts():
    p = ct.Problem()
    x = np.zeros(2)
    rb = p.add_residual_block(quad_cost(), None, [x])
    assert p.num_parameter_blocks() == 1
    assert p.num_parameters() == 2
    assert p.num_residual_blocks() == 1
    assert p.num_residuals() == 2
    p.remove_residual_block(rb)
    assert p.num_residual_blocks() == 0
    assert p.num_parameter_blocks() == 1  # block stays (reference semantics)


def test_remove_parameter_block_removes_dependents():
    p = ct.Problem()
    x = np.zeros(2)
    y = np.zeros(2)
    cost2 = ct.AutoDiffCostFunction(lambda a, b: a - b, 2, [2, 2])
    p.add_residual_block(cost2, None, [x, y])
    p.add_residual_block(quad_cost(), None, [x])
    p.remove_parameter_block(y)
    assert p.num_residual_blocks() == 1
    assert p.num_parameter_blocks() == 1


def test_size_mismatch_raises():
    p = ct.Problem()
    with pytest.raises(ValueError):
        p.add_residual_block(quad_cost(), None, [np.zeros(3)])


def test_duplicate_blocks_raise():
    p = ct.Problem()
    x = np.zeros(2)
    cost2 = ct.AutoDiffCostFunction(lambda a, b: a - b, 2, [2, 2])
    with pytest.raises(ValueError):
        p.add_residual_block(cost2, None, [x, x])


def test_constant_blocks_reduce_program():
    p = ct.Problem()
    x = np.asarray([2.0, 2.0])
    y = np.asarray([5.0, 5.0])
    p.add_residual_block(quad_cost(), None, [x])
    p.add_residual_block(quad_cost(), None, [y])
    p.set_parameter_block_constant(y)
    prog = CompiledProgram(p)
    assert prog.tangent_size == 2
    # all-constant residual blocks contribute fixed cost
    assert prog.num_residuals == 2
    np.testing.assert_allclose(prog.fixed_cost, 0.5 * 2 * 16.0)


def test_evaluate_cost_residuals_gradient_jacobian():
    p = ct.Problem()
    x = np.asarray([3.0, 0.0])
    p.add_residual_block(quad_cost(), None, [x])
    cost, res, grad, J = p.evaluate(residuals=True, gradient=True, jacobian=True)
    np.testing.assert_allclose(cost, 0.5 * (4.0 + 1.0))
    np.testing.assert_allclose(sorted(res), [-1.0, 2.0])
    np.testing.assert_allclose(J, np.eye(2))
    np.testing.assert_allclose(grad, res @ J)


def test_evaluate_crs_jacobian_matches_dense():
    """jacobian_format='crs' (problem.h:477 CRS contract) must agree with
    the dense path entry-for-entry, including constant-block columns
    being absent and multi-block residuals."""
    rng = np.random.default_rng(3)
    p = ct.Problem()
    xs = [np.asarray(rng.standard_normal(2)) for _ in range(4)]

    class PairCost(ct.CostFunction):
        num_residuals = 2
        parameter_block_sizes = (2, 2)

        def residuals(self, params, data=None):
            a, b = params
            return jnp.asarray([a[0] * b[1] - 1.0, a[1] + b[0] ** 2])

    for i in range(3):
        p.add_residual_block(PairCost(), None, [xs[i], xs[i + 1]])
    p.set_parameter_block_constant(xs[2])
    c_d, r_d, g_d, J_d = p.evaluate(residuals=True, gradient=True,
                                    jacobian=True)
    c_s, r_s, g_s, J_s = p.evaluate(residuals=True, gradient=True,
                                    jacobian=True, jacobian_format="crs")
    np.testing.assert_allclose(c_s, c_d)
    np.testing.assert_allclose(np.sort(r_s), np.sort(r_d))
    np.testing.assert_allclose(g_s, g_d)
    assert J_s.num_rows == J_d.shape[0]
    assert J_s.num_cols == J_d.shape[1]
    np.testing.assert_allclose(J_s.to_dense(), J_d, atol=1e-12)
    # sparse: the constant block's columns never appear
    assert J_s.nnz < J_d.size
    # CRS invariants
    assert J_s.rows[0] == 0 and J_s.rows[-1] == J_s.nnz
    for i in range(J_s.num_rows):
        cols = J_s.cols[J_s.rows[i]:J_s.rows[i + 1]]
        assert np.all(np.diff(cols) > 0)


def test_evaluate_without_loss():
    p = ct.Problem()
    x = np.asarray([3.0, 0.0])
    p.add_residual_block(quad_cost(), ct.CauchyLoss(0.1), [x])
    c_with = p.evaluate()
    c_without = p.evaluate(apply_loss_function=False)
    assert c_with < c_without  # Cauchy shrinks large costs
    np.testing.assert_allclose(c_without, 2.5)


def test_evaluate_residual_block():
    p = ct.Problem()
    x = np.asarray([3.0, 0.0])
    rb = p.add_residual_block(quad_cost(), None, [x])
    cost, res, jacs = p.evaluate_residual_block(rb)
    np.testing.assert_allclose(cost, 2.5)
    np.testing.assert_allclose(res, [2.0, -1.0])
    np.testing.assert_allclose(jacs[0], np.eye(2))


def test_bounds_accessors():
    p = ct.Problem()
    x = np.zeros(2)
    p.add_parameter_block(x)
    assert p.get_parameter_lower_bound(x, 0) == -np.inf
    p.set_parameter_lower_bound(x, 0, -1.0)
    p.set_parameter_upper_bound(x, 1, 2.0)
    assert p.get_parameter_lower_bound(x, 0) == -1.0
    assert p.get_parameter_upper_bound(x, 1) == 2.0


def test_mixed_kind_grouping():
    """Blocks with the same cost fn but different manifolds split kinds."""
    p = ct.Problem()
    q1 = np.asarray([1.0, 0, 0, 0])
    q2 = np.asarray([1.0, 0, 0, 0.0])
    cost = ct.AutoDiffCostFunction(lambda q: q - jnp.asarray([0.0, 1.0, 0, 0]), 4, [4])
    p.add_parameter_block(q1, manifold=ct.QuaternionManifold())
    p.add_parameter_block(q2)  # plain Euclidean
    p.add_residual_block(cost, None, [q1])
    p.add_residual_block(cost, None, [q2])
    prog = CompiledProgram(p)
    assert len(prog.kinds) == 2
    assert prog.tangent_size == 3 + 4


def test_implicit_parameter_block_registration():
    p = ct.Problem()
    x = np.zeros(2)
    p.add_residual_block(quad_cost(), None, [x])  # x never explicitly added
    assert p.num_parameter_blocks() == 1


def test_non_float64_rejected():
    p = ct.Problem()
    with pytest.raises(TypeError):
        p.add_parameter_block(np.zeros(2, dtype=np.float32))


# ----------------------------------------------- structure-version fast path


def test_compiled_program_cache_reuse_and_invalidation():
    """Repeated solves of an unmutated Problem reuse the compiled program
    (and its jitted evaluators); any structural mutation — including bound
    changes — invalidates the cache entry."""
    p = ct.Problem()
    x = np.zeros(2)
    p.add_residual_block(quad_cost(), None, [x])
    prog1 = CompiledProgram.cached(p, sort_rows=True)
    prog2 = CompiledProgram.cached(p, sort_rows=True)
    assert prog1 is prog2
    # different key -> different program
    prog3 = CompiledProgram.cached(p, sort_rows=False)
    assert prog3 is not prog1
    # structural mutation invalidates
    y = np.zeros(2)
    p.add_residual_block(quad_cost(), None, [y])
    assert CompiledProgram.cached(p, sort_rows=True) is not prog1
    # bound mutation invalidates too (bounds are baked into the jitted Plus)
    prog4 = CompiledProgram.cached(p, sort_rows=True)
    p.parameter_block_for(x).set_lower_bound(0, -1.0)
    assert CompiledProgram.cached(p, sort_rows=True) is not prog4


def test_repeated_solve_uses_cache_and_updates_values():
    p = ct.Problem()
    x = np.array([5.0, 5.0])
    p.add_residual_block(quad_cost(), None, [x])
    s1 = ct.solve(ct.Options(max_num_iterations=20), p)
    assert s1.is_solution_usable()
    np.testing.assert_allclose(x, 1.0, atol=1e-8)
    prog = p._compiled_cache[(True, "float64", True)]
    # perturb VALUES only; second solve must hit the cache and still read
    # the fresh values
    x[...] = [7.0, -3.0]
    s2 = ct.solve(ct.Options(max_num_iterations=20), p)
    assert p._compiled_cache[(True, "float64", True)] is prog
    assert s2.is_solution_usable()
    np.testing.assert_allclose(x, 1.0, atol=1e-8)
    assert s2.initial_cost > 1.0  # really restarted from the new values


def test_mutation_during_callback_raises():
    p = ct.Problem()
    x = np.array([5.0, 5.0])
    p.add_residual_block(quad_cost(), None, [x])

    def evil_callback(it_summary):
        y = np.zeros(2)
        p.add_residual_block(quad_cost(), None, [y])
        return ct.CallbackReturnType.SOLVER_CONTINUE

    with pytest.raises(RuntimeError, match="modified during Solve"):
        ct.solve(ct.Options(max_num_iterations=5, callbacks=[evil_callback]), p)
