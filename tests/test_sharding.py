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
    st1 = sharded_ba.solve_ba(bp, num_iterations=3, mesh=None, cg_iters=5, step="cg")
    st8 = sharded_ba.solve_ba(bp, num_iterations=3, mesh=sharded_ba.make_mesh(8), cg_iters=5, step="cg")
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


def test_lm_step_schur_matches_dense_reference():
    """The exact dense-Schur LM step reproduces the explicit dense LM step
    (same scaling, damping, and acceptance logic) to solver precision."""
    import numpy as np
    import jax.numpy as jnp
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba as sba

    b = bal.synthetic_bal(num_cameras=7, num_points=120, visibility=0.35,
                          noise=0.4, seed=11)
    bp = bal.perturb(b, 0.02, 0.1, 0.1, seed=12)
    cams = jnp.asarray(bp.cameras)
    pts = jnp.asarray(bp.points)
    ci = jnp.asarray(bp.camera_index)
    pi = jnp.asarray(bp.point_index)
    obs = jnp.asarray(bp.observations)
    st = sba.lm_step_schur(cams, pts, ci, pi, obs, jnp.asarray(1e4))

    r, Jc, Jp = sba._evaluate(cams, pts, ci, pi, obs)
    B = r.shape[0]
    C, P = cams.shape[0], pts.shape[0]
    J = np.zeros((B * 2, C * 9 + P * 3))
    for k in range(B):
        J[2 * k: 2 * k + 2, ci[k] * 9:(ci[k] + 1) * 9] = np.asarray(Jc[k])
        J[2 * k: 2 * k + 2, C * 9 + pi[k] * 3: C * 9 + (pi[k] + 1) * 3] = (
            np.asarray(Jp[k])
        )
    rv = np.asarray(r).reshape(-1)
    d2 = (J * J).sum(0)
    s = 1.0 / (1.0 + np.sqrt(d2))
    Js = J * s
    D2 = np.clip(s * s * d2, 1e-6, 1e32) / 1e4
    y = np.linalg.solve(Js.T @ Js + np.diag(D2), Js.T @ rv)
    step = -(y * s)
    nc = np.asarray(cams) + step[: C * 9].reshape(C, 9)
    npp = np.asarray(pts) + step[C * 9:].reshape(P, 3)
    ref_cost = float(sba.ba_cost(jnp.asarray(nc), jnp.asarray(npp), ci, pi, obs))
    assert abs(float(st.cost) - ref_cost) < 1e-9 * max(1.0, ref_cost)

    # masked padding rows must not change the step
    pad = 5
    st2 = sba.lm_step_schur(
        cams, pts,
        jnp.concatenate([ci, jnp.zeros(pad, ci.dtype)]),
        jnp.concatenate([pi, jnp.zeros(pad, pi.dtype)]),
        jnp.concatenate([obs, jnp.full((pad, 2), 1e6)]),
        jnp.asarray(1e4),
        w=jnp.concatenate([jnp.ones(B), jnp.zeros(pad)]),
    )
    assert abs(float(st2.cost) - float(st.cost)) < 1e-9 * float(st.cost)


def test_lm_step_schur_pallas_plan_matches_scatter():
    """The Mosaic-kernel point reductions (interpret mode on CPU) agree
    with the scatter path on point-sorted data."""
    import numpy as np
    import jax.numpy as jnp
    from ceres_tpu.models import bal
    from ceres_tpu.ops import pallas_kernels as pk
    from ceres_tpu.parallel import sharded_ba as sba

    b = bal.synthetic_bal(num_cameras=8, num_points=120, visibility=0.4,
                          noise=0.3, seed=3)
    bp = bal.perturb(b, 0.02, 0.1, 0.1, seed=4)
    order = np.argsort(np.asarray(bp.point_index), kind="stable")
    ci = jnp.asarray(np.asarray(bp.camera_index)[order])
    pi = jnp.asarray(np.asarray(bp.point_index)[order])
    obs = jnp.asarray(np.asarray(bp.observations)[order], jnp.float32)
    cams = jnp.asarray(bp.cameras, jnp.float32)
    pts = jnp.asarray(bp.points, jnp.float32)
    st0 = sba.lm_step_schur(cams, pts, ci, pi, obs, jnp.float32(1e4))
    plan = pk.plan_block_tiles(np.asarray(pi), pts.shape[0])
    st1 = sba.lm_step_schur(cams, pts, ci, pi, obs, jnp.float32(1e4),
                            pallas_plan=plan, pallas_interpret=True)
    # f32 reduction-order differences only
    assert abs(float(st0.cost) - float(st1.cost)) < 1e-3 * float(st0.cost)
    np.testing.assert_allclose(np.asarray(st1.cams), np.asarray(st0.cams),
                               rtol=1e-2, atol=1e-4)


def test_lm_step_schur_k_matches_stepwise():
    import numpy as np
    import jax.numpy as jnp
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba as sba

    b = bal.synthetic_bal(num_cameras=6, num_points=80, visibility=0.4,
                          noise=0.3, seed=5)
    bp = bal.perturb(b, 0.02, 0.1, 0.1, seed=6)
    ci = jnp.asarray(bp.camera_index)
    pi = jnp.asarray(bp.point_index)
    obs = jnp.asarray(bp.observations)
    cams = jnp.asarray(bp.cameras)
    pts = jnp.asarray(bp.points)
    st = sba.BAState(cams, pts, jnp.asarray(1e4), jnp.asarray(0.0))
    for _ in range(6):
        st = sba.lm_step_schur(st.cams, st.pts, ci, pi, obs, st.radius)
    stk = sba.lm_step_schur_k(cams, pts, ci, pi, obs, jnp.asarray(1e4), k=6)
    np.testing.assert_allclose(float(stk.cost), float(st.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(stk.cams), np.asarray(st.cams),
                               atol=1e-12)


def test_sharded_fused_lm_matches_single_device():
    """solve_sharded_fused (whole LM loop as one jit over the mesh) agrees
    with the single-device fused loop."""
    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.parallel.mesh import make_mesh
    from ceres_tpu.solvers.fused_lm import solve_sharded_fused

    def make():
        b = bal.perturb(
            bal.synthetic_bal(6, 60, 0.5, noise=0.1, seed=3), 0.01, 0.05, 0.05
        )
        return bal.build_problem_batched(b)[0]

    opts = dict(linear_solver_type=ct.LinearSolverType.CGNR,
                max_num_iterations=15)
    s = solve_sharded_fused(ct.Options(**opts), make(), make_mesh(8))
    assert s.is_solution_usable()
    assert s.num_devices == 8
    ref = ct.solve(ct.Options(fused_loop="ALWAYS", **opts), make())
    assert abs(s.final_cost - ref.final_cost) < 1e-6 * max(1.0, ref.final_cost)


def test_point_sharded_state_is_partitioned_and_matches_replicated():
    """SURVEY §5.7 point sharding: the point table is genuinely
    partitioned over the mesh (per-device shard shape == Pl x 3, not the
    full P), and k LM iterations reproduce the replicated lm_step_schur_k
    trajectory to 1e-10."""
    b = bal.synthetic_bal(num_cameras=5, num_points=97, visibility=0.4,
                          noise=0.5, seed=7)
    b = bal.perturb(b, rotation_sigma=0.01, translation_sigma=0.1,
                    point_sigma=0.1, seed=8)
    mesh = sharded_ba.make_mesh(8, axis="pt")
    st, plan = sharded_ba.solve_ba_point_sharded(
        b, num_iterations=4, mesh=mesh, k=4)

    # state is actually partitioned: every device holds Pl rows, and the
    # global padded table is 8 * Pl
    assert st.pts.shape[0] == 8 * plan.Pl
    for shard in st.pts.addressable_shards:
        assert shard.data.shape == (plan.Pl, 3)

    # replicated reference on the ORIGINAL (unpadded, point-sorted) layout
    order = np.argsort(np.asarray(b.point_index), kind="stable")
    ref = sharded_ba.lm_step_schur_k(
        jnp.asarray(b.cameras), jnp.asarray(b.points),
        jnp.asarray(np.asarray(b.camera_index)[order]),
        jnp.asarray(np.asarray(b.point_index)[order]),
        jnp.asarray(np.asarray(b.observations)[order]),
        jnp.asarray(1e4, jnp.float64), k=4)
    np.testing.assert_allclose(float(st.cost), float(ref.cost), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st.cams), np.asarray(ref.cams),
                               rtol=1e-10, atol=1e-12)
    got_pts = np.asarray(st.pts)[plan.point_slot]
    np.testing.assert_allclose(got_pts, np.asarray(ref.pts),
                               rtol=1e-10, atol=1e-12)


def test_point_sharded_uneven_tracks():
    """Power-law track lengths: shard loads are balanced by observation
    count, padding rows stay inert."""
    rng = np.random.default_rng(3)
    b = bal.synthetic_bal(num_cameras=6, num_points=64, visibility=0.9,
                          noise=0.3, seed=11)
    mesh = sharded_ba.make_mesh(8, axis="pt")
    st, plan = sharded_ba.solve_ba_point_sharded(
        b, num_iterations=2, mesh=mesh, k=2)
    assert np.isfinite(float(st.cost))
    order = np.argsort(np.asarray(b.point_index), kind="stable")
    ref = sharded_ba.lm_step_schur_k(
        jnp.asarray(b.cameras), jnp.asarray(b.points),
        jnp.asarray(np.asarray(b.camera_index)[order]),
        jnp.asarray(np.asarray(b.point_index)[order]),
        jnp.asarray(np.asarray(b.observations)[order]),
        jnp.asarray(1e4, jnp.float64), k=2)
    np.testing.assert_allclose(float(st.cost), float(ref.cost), rtol=1e-10)


def test_camera_sharded_lm_matches_unsharded():
    """Fully-sharded (camera AND point tables partitioned, SURVEY §5.7)
    LM step vs the single-device CG step at f64: same math, one
    all-gather + psums — parity to 1e-10."""
    import numpy as np

    b = bal.synthetic_bal(num_cameras=24, num_points=300, visibility=0.2,
                          noise=0.3, seed=11)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)
    bp = bal.BALProblem(bp.cameras.astype(np.float64),
                        bp.points.astype(np.float64),
                        bp.camera_index, bp.point_index,
                        bp.observations.astype(np.float64))

    # single-device reference: identical CG-step math
    import jax.numpy as jnp
    st_ref = sharded_ba.BAState(
        jnp.asarray(bp.cameras), jnp.asarray(bp.points),
        jnp.asarray(1e4, jnp.float64), jnp.asarray(0.0, jnp.float64))
    for _ in range(3):
        st_ref = sharded_ba.lm_step(
            st_ref.cams, st_ref.pts, jnp.asarray(bp.camera_index),
            jnp.asarray(bp.point_index), jnp.asarray(bp.observations),
            st_ref.radius, cg_iters=8)

    st, plan = sharded_ba.solve_ba_camera_sharded(
        bp, num_iterations=3, mesh=sharded_ba.make_mesh(8, axis="cam"), k=1,
        cg_iters=8)

    # shard layouts hold: cams/pts partitioned over the 8 devices
    assert len(st.cams.sharding.device_set) == 8
    assert st.cams.addressable_shards[0].data.shape[0] == plan.Cl
    assert st.pts.addressable_shards[0].data.shape[0] == plan.Pl

    cams_out = np.asarray(st.cams)[plan.camera_slot]
    pts_out = np.asarray(st.pts)[plan.point_slot]
    np.testing.assert_allclose(cams_out, np.asarray(st_ref.cams),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(pts_out, np.asarray(st_ref.pts),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(st.cost), float(st_ref.cost),
                               rtol=1e-10)


def test_camera_halo_lm_matches_unsharded():
    """Visibility-cut halo-exchange tier (SURVEY §5.7/5.8: gather only
    the point segments each camera shard's observations touch) vs the
    single-device CG step at f64 — parity to 1e-10, with BOTH state
    tables partitioned and only cut-sized collectives."""
    import numpy as np

    b = bal.synthetic_bal(num_cameras=24, num_points=300, visibility=0.2,
                          noise=0.3, seed=11)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)
    bp = bal.BALProblem(bp.cameras.astype(np.float64),
                        bp.points.astype(np.float64),
                        bp.camera_index, bp.point_index,
                        bp.observations.astype(np.float64))

    import jax.numpy as jnp
    st_ref = sharded_ba.BAState(
        jnp.asarray(bp.cameras), jnp.asarray(bp.points),
        jnp.asarray(1e4, jnp.float64), jnp.asarray(0.0, jnp.float64))
    for _ in range(3):
        st_ref = sharded_ba.lm_step(
            st_ref.cams, st_ref.pts, jnp.asarray(bp.camera_index),
            jnp.asarray(bp.point_index), jnp.asarray(bp.observations),
            st_ref.radius, cg_iters=8)

    st, plan = sharded_ba.solve_ba_camera_sharded(
        bp, num_iterations=3, mesh=sharded_ba.make_mesh(8, axis="cam"),
        k=1, cg_iters=8, halo=True)
    assert isinstance(plan, sharded_ba.CameraHaloPlan)
    assert len(st.cams.sharding.device_set) == 8
    assert st.pts.addressable_shards[0].data.shape[0] == plan.Pl

    cams_out = np.asarray(st.cams)[plan.camera_slot]
    pts_out = np.asarray(st.pts)[plan.point_slot]
    np.testing.assert_allclose(cams_out, np.asarray(st_ref.cams),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(pts_out, np.asarray(st_ref.pts),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(st.cost), float(st_ref.cost),
                               rtol=1e-10)


def test_camera_halo_ceres_semantics():
    """Ceres-semantics sharded LM (solver.h Options subset on the
    halo-sharded tier): runs the GENERIC conjugate_gradients with
    psum-closed dot/norm (conjugate_gradients_solver.h:109 vector-type
    templating), the trust_region_step_evaluator acceptance, and the
    trust_region_minimizer tolerance taxonomy — must terminate via a
    tolerance (CONVERGENCE), not the iteration cap, and reach at least
    the fixed-rule tier's cost."""
    from ceres_tpu.types import TerminationType

    b = bal.synthetic_bal(num_cameras=24, num_points=300, visibility=0.2,
                          noise=0.3, seed=11)
    bp = bal.perturb(b, 0.02, 0.1, 0.1)
    bp = bal.BALProblem(bp.cameras.astype(np.float64),
                        bp.points.astype(np.float64),
                        bp.camera_index, bp.point_index,
                        bp.observations.astype(np.float64))

    st, plan, term = sharded_ba.solve_ba_camera_halo_ceres(
        bp, mesh=sharded_ba.make_mesh(8, axis="cam"), k=4,
        max_num_iterations=60)
    assert term == TerminationType.CONVERGENCE
    assert st.pts.addressable_shards[0].data.shape[0] == plan.Pl

    ref = sharded_ba.BAState(
        jnp.asarray(bp.cameras), jnp.asarray(bp.points),
        jnp.asarray(1e4, jnp.float64), jnp.asarray(0.0, jnp.float64))
    for _ in range(60):
        ref = sharded_ba.lm_step(
            ref.cams, ref.pts, jnp.asarray(bp.camera_index),
            jnp.asarray(bp.point_index), jnp.asarray(bp.observations),
            ref.radius, cg_iters=10)
    assert float(st.cost) <= float(ref.cost) * 1.01

    # nonmonotonic option engages without breaking convergence
    st2, _, term2 = sharded_ba.solve_ba_camera_halo_ceres(
        bp, options=sharded_ba.ShardedLMOptions(
            use_nonmonotonic_steps=True),
        mesh=sharded_ba.make_mesh(8, axis="cam"), k=4,
        max_num_iterations=60)
    assert term2 == TerminationType.CONVERGENCE
    assert float(st2.cost) <= float(ref.cost) * 1.02


def _quat_ba_small(seed=0):
    from ceres_tpu.models import bal

    b = bal.synthetic_bal(num_cameras=8, num_points=120, visibility=0.4,
                          noise=0.3, seed=seed)
    b = bal.perturb(b, 0.02, 0.1, 0.1, seed=seed + 1)
    return b


def test_generic_halo_matches_single_device():
    """The GENERALIZED halo tier (parallel/sharded_program.py, round-5
    verdict #5): a plain generic-program BA run on the 8-device mesh must
    match the SAME code on a 1-device mesh to 1e-10 — the sharding is
    math-invariant (every reduction psum-closed, halo exchanges exact)."""
    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba, sharded_program as sp
    from ceres_tpu.program import CompiledProgram

    b = _quat_ba_small()
    # pinned CG budget: the adaptive q-tolerance stop reacts to f64
    # summation-order noise, which differs between device counts and
    # would branch the LM trajectory — with the budget pinned, the
    # remaining difference is pure roundoff
    opts = sharded_ba.ShardedLMOptions(eta=1e-30,
                                       max_linear_solver_iterations=8)
    p1, _, _ = bal.build_problem_batched(b)
    prog1 = CompiledProgram(p1)
    x8, info8, term8 = sp.solve_program_camera_halo(
        prog1, opts, max_num_iterations=6,
        mesh=sharded_ba.make_mesh(8, axis="cam"), k=2)
    p2, _, _ = bal.build_problem_batched(b)
    prog2 = CompiledProgram(p2)
    x1, info1, term1 = sp.solve_program_camera_halo(
        prog2, opts, max_num_iterations=6,
        mesh=sharded_ba.make_mesh(1, axis="cam"), k=2)
    assert info8["final_cost"] == pytest.approx(info1["final_cost"],
                                               rel=1e-10)
    np.testing.assert_allclose(x8, x1, rtol=1e-8, atol=1e-10)


def test_generic_halo_quaternion_manifold():
    """A MANIFOLD program through the halo tier: quaternion-camera BA
    (ProductManifold(Quaternion, Euclidean(6))) — the per-family plus and
    the in-evaluation chain rule shard identically (1e-10 vs 1-device),
    quaternions stay unit, and the solve reaches the unsharded basin."""
    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba, sharded_program as sp
    from ceres_tpu.program import CompiledProgram

    b = _quat_ba_small(seed=5)
    opts = sharded_ba.ShardedLMOptions(eta=1e-30,
                                       max_linear_solver_iterations=8)
    pq, _, _ = bal.build_problem_batched_quat(b)
    prog = CompiledProgram(pq)
    x8, info8, term8 = sp.solve_program_camera_halo(
        prog, opts, max_num_iterations=8,
        mesh=sharded_ba.make_mesh(8, axis="cam"), k=2)
    pq1, _, _ = bal.build_problem_batched_quat(b)
    x1, info1, _ = sp.solve_program_camera_halo(
        CompiledProgram(pq1), opts, max_num_iterations=8,
        mesh=sharded_ba.make_mesh(1, axis="cam"), k=2)
    assert info8["final_cost"] == pytest.approx(info1["final_cost"],
                                               rel=1e-10)
    fam_f = prog.kinds[0].slots[0].family
    C, af = fam_f.count, fam_f.asize
    cams = x8[fam_f.state_offset:
              fam_f.state_offset + C * af].reshape(C, af)
    qn = np.linalg.norm(cams[:, :4], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-9)
    # reaches the unsharded basin
    pq2, _, _ = bal.build_problem_batched_quat(b)
    s = ct.solve(ct.Options(max_num_iterations=8, fused_loop="NEVER",
                            linear_solver_type=(
                                ct.LinearSolverType.ITERATIVE_SCHUR)), pq2)
    assert info8["final_cost"] <= s.final_cost * 1.05
