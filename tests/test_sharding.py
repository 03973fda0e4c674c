"""Mesh-sharding tests on the 8-device CPU mesh — the analog of the
reference's thread-matrix tests (SURVEY.md §4.8): sharded evaluation must
match single-device results bitwise-deterministically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal, pose_graph as pg
from ceres_tpu.parallel import sharded_ba
from ceres_tpu.parallel.mesh import ShardedProgramEvaluator, make_mesh
from ceres_tpu.program import CompiledProgram

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_generic_sharded_evaluator_matches_single_device():
    b = bal.synthetic_bal(num_cameras=4, num_points=37, visibility=0.5, noise=0.2, seed=5)
    p, _, _ = bal.build_problem(b)
    prog = CompiledProgram(p)
    x = prog.initial_state()
    c_ref, _, g_ref = prog.evaluate_grad(x)
    ev = ShardedProgramEvaluator(prog, make_mesh(8))
    c, g = ev.evaluate_grad(x)
    np.testing.assert_allclose(float(c), float(c_ref), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-12)


def test_generic_sharded_with_manifolds_and_loss():
    poses, cons, _ = pg.synthetic_3d(num_poses=21, loop_closures=5, noise=0.01, seed=1)
    p3, _ = pg.build_problem_3d(poses, cons, loss=ct.HuberLoss(1.0))
    prog = CompiledProgram(p3)
    x = prog.initial_state()
    c_ref, _, g_ref = prog.evaluate_grad(x)
    ev = ShardedProgramEvaluator(prog, make_mesh(8))
    c, g = ev.evaluate_grad(x)
    np.testing.assert_allclose(float(c), float(c_ref), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-10)


def test_sharded_evaluation_is_deterministic():
    b = bal.synthetic_bal(num_cameras=4, num_points=40, visibility=0.5, seed=3)
    p, _, _ = bal.build_problem(b)
    prog = CompiledProgram(p)
    ev = ShardedProgramEvaluator(prog, make_mesh(8))
    x = prog.initial_state()
    g1 = np.asarray(ev.evaluate_grad(x)[1])
    g2 = np.asarray(ev.evaluate_grad(x)[1])
    assert np.array_equal(g1, g2)  # bitwise (fixed reduction order)


def test_sharded_ba_lm_matches_unsharded():
    b = bal.synthetic_bal(num_cameras=4, num_points=33, visibility=0.5, noise=0.3, seed=9)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)
    st1 = sharded_ba.solve_ba(bp, num_iterations=3, mesh=None, cg_iters=5)
    st8 = sharded_ba.solve_ba(bp, num_iterations=3, mesh=sharded_ba.make_mesh(8), cg_iters=5)
    np.testing.assert_allclose(float(st8.cost), float(st1.cost), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(st8.cams), np.asarray(st1.cams), atol=1e-9
    )


def test_sharded_ba_reduces_cost():
    b = bal.synthetic_bal(num_cameras=6, num_points=64, visibility=0.4, noise=0.5, seed=2)
    bp = bal.perturb(b, 0.02, 0.2, 0.2)
    cam0 = jnp.asarray(bp.cameras)
    c0 = sharded_ba.ba_cost(
        cam0,
        jnp.asarray(bp.points),
        jnp.asarray(bp.camera_index),
        jnp.asarray(bp.point_index),
        jnp.asarray(bp.observations),
    )
    st = sharded_ba.solve_ba(bp, num_iterations=8, mesh=sharded_ba.make_mesh(8))
    assert float(st.cost) < float(c0) / 10


def test_fully_sharded_lm_matches_single_device():
    """The whole trust-region inner math (eval + CGNR Krylov loop) sharded
    over the mesh reaches the single-device final cost."""
    from ceres_tpu.parallel.mesh import solve_sharded

    def make():
        b = bal.synthetic_bal(num_cameras=6, num_points=60, visibility=0.5,
                              noise=0.2, seed=7)
        bp = bal.perturb(b, 0.02, 0.1, 0.1)
        return bal.build_problem_batched(bp)[0]

    s_ref = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   max_num_iterations=40),
        make(),
    )
    s = solve_sharded(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   max_num_iterations=40),
        make(),
        make_mesh(8),
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert abs(s.final_cost - s_ref.final_cost) < 1e-4 * max(1.0, s_ref.final_cost)
    assert s.num_devices == 8
