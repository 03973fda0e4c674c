"""Evaluator layout/regression tests (reference evaluator_test.cc, 726 LoC:
check the exact Jacobian layout per writer type on a hand-built problem)."""
import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct
from ceres_tpu.ops import bsr
from ceres_tpu.program import CompiledProgram


def build_fixture():
    """Two kinds over three parameter blocks (sizes 2, 3, 4)."""
    x = np.asarray([1.0, 2.0])
    y = np.asarray([3.0, 4.0, 5.0])
    z = np.asarray([6.0, 7.0, 8.0, 9.0])

    # kind A: r = [sum(x), sum(y)] over (x, y)
    costA = ct.AutoDiffCostFunction(
        lambda a, b: jnp.stack([jnp.sum(a), jnp.sum(b)]), 2, [2, 3]
    )
    # kind B: r = z * 2 over (z,)
    costB = ct.AutoDiffCostFunction(lambda c: 2.0 * c, 4, [4])
    p = ct.Problem()
    p.add_residual_block(costA, None, [x, y])
    p.add_residual_block(costB, None, [z])
    return p, (x, y, z)


def test_dense_jacobian_layout():
    p, (x, y, z) = build_fixture()
    prog = CompiledProgram(p)
    xs = prog.initial_state()
    cost, res, grad, J = prog.evaluate_dense(xs)
    J = np.asarray(J)
    assert J.shape == (6, 9)
    # find tangent offsets per family (sizes 2, 3, 4 -> distinct families)
    offs = {f.asize: f.tangent_offset for f in prog.families}
    # kind A rows (first 2): d r0/dx = [1,1], d r1/dy = [1,1,1]
    np.testing.assert_allclose(J[0, offs[2] : offs[2] + 2], [1, 1])
    np.testing.assert_allclose(J[0, offs[3] : offs[3] + 3], 0)
    np.testing.assert_allclose(J[1, offs[3] : offs[3] + 3], [1, 1, 1])
    # kind B rows: 2*I in the z columns
    np.testing.assert_allclose(
        J[2:6, offs[4] : offs[4] + 4], 2.0 * np.eye(4)
    )
    np.testing.assert_allclose(grad, J.T @ np.asarray(res))
    np.testing.assert_allclose(float(cost), 0.5 * float(np.sum(np.asarray(res) ** 2)))


def test_block_jacobian_consistent_with_dense():
    p, _ = build_fixture()
    prog = CompiledProgram(p)
    xs = prog.initial_state()
    _, _, _, Jd = prog.evaluate_dense(xs)
    _, _, _, values = prog.evaluate_bsr(xs)
    meta = bsr.build_meta(prog)
    np.testing.assert_allclose(np.asarray(bsr.to_dense(meta, values)), np.asarray(Jd))


def test_residual_vector_row_order_is_kind_major():
    p, (x, y, z) = build_fixture()
    prog = CompiledProgram(p)
    _, res = prog.evaluate_residuals(prog.initial_state())
    res = np.asarray(res)
    np.testing.assert_allclose(res[:2], [3.0, 12.0])  # kind A
    np.testing.assert_allclose(res[2:], 2.0 * np.asarray([6, 7, 8, 9.0]))


def test_evaluation_callback_invoked():
    calls = []

    class CB(ct.callbacks.EvaluationCallback):
        def prepare_for_evaluation(self, evaluate_jacobians, new_evaluation_point):
            calls.append((evaluate_jacobians, new_evaluation_point))

    import ceres_tpu.callbacks  # noqa: F401

    p, _ = build_fixture()
    opts = ct.Options(max_num_iterations=3)
    opts.evaluation_callback = CB()
    ct.solve(opts, p)
    assert len(calls) >= 1
    assert all(ej for (ej, _) in calls)


def test_update_state_every_iteration():
    seen = []

    def cb(it):
        seen.append(float(xarr[0]))
        return ct.CallbackReturnType.SOLVER_CONTINUE

    xarr = np.asarray([5.0])
    p = ct.Problem()
    p.add_residual_block(ct.AutoDiffCostFunction(lambda v: v - 1.0, 1, [1]), None, [xarr])
    opts = ct.Options(
        max_num_iterations=5, update_state_every_iteration=True, callbacks=[cb]
    )
    ct.solve(opts, p)
    # the user-visible array must change during the solve, not only at the end
    assert len(set(seen)) > 1
