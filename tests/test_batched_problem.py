"""Batched problem construction tests (parameter block arrays + batched
residual adds — the scale path)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.program import CompiledProgram


def test_batched_matches_per_block():
    b = bal.synthetic_bal(num_cameras=5, num_points=40, visibility=0.5, noise=0.2, seed=3)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)

    def run(builder):
        prob, *_ = builder(
            bal.BALProblem(bp.cameras.copy(), bp.points.copy(), bp.camera_index,
                           bp.point_index, bp.observations)
        )
        return ct.solve(
            ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                       max_num_iterations=40),
            prob,
        )

    s1 = run(bal.build_problem)
    s2 = run(bal.build_problem_batched)
    assert abs(s1.final_cost - s2.final_cost) < 1e-10 * max(1.0, s1.final_cost)
    assert s2.num_residual_blocks == b.num_observations


def test_batched_writes_back_into_2d_arrays():
    b = bal.synthetic_bal(num_cameras=4, num_points=30, visibility=0.5, noise=0.1, seed=5)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)
    p, cam_values, pt_values = bal.build_problem_batched(bp)
    before = cam_values.copy()
    ct.solve(ct.Options(max_num_iterations=10), p)
    assert not np.allclose(cam_values, before)  # optimized in place


def test_batched_constant_array_contributes_fixed_cost():
    p = ct.Problem()
    xs = p.add_parameter_block_array(np.full((3, 2), 2.0))
    ys = p.add_parameter_block_array(np.full((3, 2), 5.0))
    cost = ct.AutoDiffCostFunction(lambda v: v - 1.0, 2, [2])
    p.add_residual_block_batch(cost, None, [(xs, np.arange(3))])
    p.add_residual_block_batch(cost, None, [(ys, np.arange(3))])
    p.set_parameter_block_array_constant(ys)
    s = ct.solve(ct.Options(max_num_iterations=30), p)
    np.testing.assert_allclose(s.fixed_cost, 0.5 * 3 * 2 * 16.0)
    np.testing.assert_allclose(s.final_cost, s.fixed_cost, atol=1e-9)


def test_batched_with_manifold_and_bounds():
    p = ct.Problem()
    q = np.tile(np.asarray([1.0, 0, 0, 0]), (4, 1))
    qs = p.add_parameter_block_array(q, manifold=ct.QuaternionManifold())
    target = np.asarray([np.cos(0.2), np.sin(0.2), 0, 0])
    cost = ct.AutoDiffCostFunction(lambda v, t: v - t, 4, [4])
    p.add_residual_block_batch(
        cost, None, [(qs, np.arange(4))], data=np.tile(target, (4, 1))
    )
    s = ct.solve(ct.Options(max_num_iterations=40), p)
    assert s.final_cost < 1e-12
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-10)

    # bounds on a plain array
    p2 = ct.Problem()
    v = np.full((3, 1), 5.0)
    vs = p2.add_parameter_block_array(v)
    p2.set_parameter_block_array_bounds(vs, lower=2.0)
    p2.add_residual_block_batch(
        ct.AutoDiffCostFunction(lambda x: x - 1.0, 1, [1]), None,
        [(vs, np.arange(3))],
    )
    ct.solve(ct.Options(max_num_iterations=30), p2)
    np.testing.assert_allclose(v, 2.0, atol=1e-9)


def test_batched_validation_errors():
    p = ct.Problem()
    xs = p.add_parameter_block_array(np.zeros((3, 2)))
    cost = ct.AutoDiffCostFunction(lambda v: v, 2, [2])
    with pytest.raises(ValueError):
        p.add_residual_block_batch(cost, None, [(xs, np.asarray([0, 1, 5]))])
    cost3 = ct.AutoDiffCostFunction(lambda v: v, 3, [3])
    with pytest.raises(ValueError):
        p.add_residual_block_batch(cost3, None, [(xs, np.arange(3))])


def test_batched_sharded_evaluation():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from ceres_tpu.parallel.mesh import ShardedProgramEvaluator, make_mesh

    b = bal.synthetic_bal(num_cameras=4, num_points=37, visibility=0.5, noise=0.2, seed=5)
    p, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(p)
    x = prog.initial_state()
    c_ref, _, g_ref = prog.evaluate_grad(x)
    ev = ShardedProgramEvaluator(prog, make_mesh(8))
    c, g = ev.evaluate_grad(x)
    np.testing.assert_allclose(float(c), float(c_ref), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-11)
