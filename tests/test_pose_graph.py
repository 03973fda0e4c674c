"""Pose graph SLAM tests (the reference slam examples as acceptance tests,
BASELINE.md config 5)."""
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import pose_graph as pg


def test_2d_slam_converges_and_closes_loops():
    poses, cons, gt = pg.synthetic_2d(num_poses=60, loop_closures=10, noise=0.02, seed=1)
    err0 = np.mean(
        [np.hypot(poses[i].x - gt[i].x, poses[i].y - gt[i].y) for i in range(60)]
    )
    p, arrays = pg.build_problem_2d(poses, cons)
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
            max_num_iterations=100,
        ),
        p,
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    err1 = np.mean(
        [
            np.hypot(arrays[i][0][0] - gt[i].x, arrays[i][1][0] - gt[i].y)
            for i in range(60)
        ]
    )
    assert err1 < err0 / 5  # loop closures pulled the drift back
    # First pose fixed.
    assert arrays[0][0][0] == pytest.approx(gt[0].x)


def test_2d_angle_manifold_wraps():
    m = pg.angle_manifold()
    import jax.numpy as jnp

    y = m.plus(jnp.asarray([3.0]), jnp.asarray([0.5]))
    assert -np.pi < float(y[0]) <= np.pi


def test_3d_slam_converges_unit_quaternions():
    poses, cons, gt = pg.synthetic_3d(num_poses=40, loop_closures=8, noise=0.01, seed=1)
    p, arrays = pg.build_problem_3d(poses, cons, loss=ct.HuberLoss(1.0))
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
            max_num_iterations=100,
        ),
        p,
    )
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    assert s.final_cost < s.initial_cost / 5
    for i in range(40):
        assert np.linalg.norm(arrays[i][1]) == pytest.approx(1.0, abs=1e-9)


def test_g2o_2d_roundtrip(tmp_path):
    path = tmp_path / "test.g2o"
    path.write_text(
        "VERTEX_SE2 0 0.0 0.0 0.0\n"
        "VERTEX_SE2 1 1.0 0.1 0.05\n"
        "EDGE_SE2 0 1 1.0 0.0 0.0 100 0 0 100 0 400\n"
    )
    poses, cons = pg.read_g2o_2d(path)
    assert len(poses) == 2 and len(cons) == 1
    assert cons[0].information[0, 0] == 100
    assert cons[0].information[2, 2] == 400
    p, arrays = pg.build_problem_2d(poses, cons)
    s = ct.solve(ct.Options(max_num_iterations=20), p)
    assert s.final_cost < 1e-12  # single edge fully satisfiable


def test_g2o_3d_roundtrip(tmp_path):
    path = tmp_path / "t3.g2o"
    info21 = " ".join(
        str(v)
        for v in np.triu(np.diag([100.0] * 3 + [400.0] * 3)).flatten()[
            np.triu_indices(6)[0] * 6 + np.triu_indices(6)[1]
        ]
    )
    path.write_text(
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "VERTEX_SE3:QUAT 1 1 0 0 0 0 0 1\n"
        f"EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 {info21}\n"
    )
    poses, cons = pg.read_g2o_3d(path)
    assert len(poses) == 2 and len(cons) == 1
    np.testing.assert_allclose(cons[0].information, np.diag([100.0] * 3 + [400.0] * 3))
    p, arrays = pg.build_problem_3d(poses, cons)
    s = ct.solve(ct.Options(max_num_iterations=20), p)
    assert s.final_cost < 1e-12


def test_inner_iterations_pose_graph_block_coloring():
    """Block-granular independent sets (coordinate_descent_minimizer.h:84
    CreateOrdering, graph_algorithms.h:165): a pose graph — binary
    residuals inside ONE pose family — must decompose by graph coloring
    into >=2 independent sets per family, inner iterations must actually
    RUN (round-4: zero eligible sets silently degraded to plain LM), and
    the inner run must reach at least the plain run's cost."""
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.coordinate_descent import CoordinateDescentMinimizer

    poses, cons, _ = pg.synthetic_2d(num_poses=40, loop_closures=6,
                                     noise=0.1, seed=3)
    p, _ = pg.build_problem_2d(poses, cons)
    prog = CompiledProgram(p)
    cdm = CoordinateDescentMinimizer(prog, ct.Options())
    assert len(cdm.sets) >= 2
    assert any(mask is not None for _, mask in cdm.sets)
    # every colored set is truly independent: no residual couples two
    # blocks of the same color
    for fi, mask in cdm.sets:
        if mask is None:
            continue
        fam = prog.families[fi]
        for kind in prog.kinds:
            ours = [s for s in kind.slots
                    if s.family is fam and s.any_variable]
            for a in range(len(ours)):
                for b in range(a + 1, len(ours)):
                    pa = np.asarray(ours[a].pos_in_family)
                    pb = np.asarray(ours[b].pos_in_family)
                    keep = (pa < fam.num_var) & (pb < fam.num_var) & (pa != pb)
                    assert not np.any(mask[pa[keep]] & mask[pb[keep]])

    def run(inner):
        poses2, cons2, _ = pg.synthetic_2d(num_poses=40, loop_closures=6,
                                           noise=0.1, seed=3)
        p2, _ = pg.build_problem_2d(poses2, cons2)
        return ct.solve(
            ct.Options(max_num_iterations=4, fused_loop="NEVER",
                       use_inner_iterations=inner), p2)

    s_plain = run(False)
    s_inner = run(True)
    assert s_inner.num_inner_iteration_steps >= 1
    assert s_inner.inner_iterations_used
    assert s_inner.final_cost <= s_plain.final_cost * (1 + 1e-6)
