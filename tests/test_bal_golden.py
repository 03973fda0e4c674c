"""Golden-cost acceptance gate at the REAL bench shape.

The reference asserts final parameters within 1e-4 of a single-thread
DENSE_SCHUR reference across 89 generated configs on BAL problem-16-22106
(bundle_adjustment_test_util.h:30-95, generated_bundle_adjustment_tests/).
No BAL file ships in this image, so the gate runs on the committed
synthetic instance of the same shape (16 cameras, 22106 points, ~83k
observations — bench.py's workload): every solver/preconditioner config
must reach the f64 host-loop DENSE_SCHUR converged cost (bench_golden.json,
value 51931.10068) within 1e-4 relative. Dense-J solvers (DENSE_QR /
DENSE_NORMAL_CHOLESKY) are excluded exactly as the reference's generated
BA tests exclude them: a dense 83k x 66k J is not a BA configuration.

Round-3 widening toward the reference's 89-config matrix
(generate_bundle_adjustment_tests.py:55-76): user-supplied ordering,
bounds-constrained BA (wide/inactive box — the projection path must not
change the answer), dogleg (TRADITIONAL and SUBSPACE), inner iterations,
mixed-precision DENSE_SCHUR and SPARSE_NORMAL_CHOLESKY, explicit-S
ITERATIVE_SCHUR, SUBSET preconditioner, nonmonotonic steps, a
sharded-8-device-mesh configuration, and a second problem with a
different block-size mix (6-dof cameras + shared 3-dof intrinsics)
checked against its own f64 DENSE_SCHUR reference.
"""
import functools
import json
import os
import pathlib

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal

pytestmark = pytest.mark.slow

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent.parent / "bench_golden.json").read_text()
)["bal16_dense_schur_f64"]


def make_bench_bal():
    n_cams, n_pts = 16, 22106
    vis = 83718 / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    return bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                       point_sigma=0.2, seed=1)


def make_bench_problem():
    return bal.build_problem_batched(make_bench_bal())[0]


# (solver, preconditioner, fused, dtype, max_iters, extra)
# extra keys going straight into Options, plus the specials
# "user_ordering" / "bounds" / "subset" handled in the test body.
CONFIGS = [
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 25, {}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float64", 25, {}),
    ("DENSE_SCHUR", "JACOBI", "NEVER", "float64", 25, {}),
    ("SPARSE_SCHUR", "JACOBI", "NEVER", "float64", 25, {}),
    ("SPARSE_NORMAL_CHOLESKY", "JACOBI", "NEVER", "float64", 25, {}),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "ALWAYS", "float32", 30, {}),
    ("ITERATIVE_SCHUR", "IDENTITY", "ALWAYS", "float32", 30, {}),
    ("ITERATIVE_SCHUR", "SCHUR_POWER_SERIES_EXPANSION", "ALWAYS",
     "float32", 30, {}),
    ("ITERATIVE_SCHUR", "CLUSTER_JACOBI", "ALWAYS", "float32", 30, {}),
    ("ITERATIVE_SCHUR", "CLUSTER_TRIDIAGONAL", "ALWAYS", "float32", 30, {}),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "NEVER", "float64", 30, {}),
    ("CGNR", "JACOBI", "ALWAYS", "float32", 35, {}),
    # --- round-3 widening (generate_bundle_adjustment_tests.py axes) ---
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 25,
     {"user_ordering": True}),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "ALWAYS", "float32", 30,
     {"user_ordering": True}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 25, {"bounds": True}),
    ("DENSE_SCHUR", "JACOBI", "NEVER", "float64", 25, {"bounds": True}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 30,
     {"trust_region_strategy_type": ct.TrustRegionStrategyType.DOGLEG,
      "dogleg_type": ct.DoglegType.TRADITIONAL_DOGLEG}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 30,
     {"trust_region_strategy_type": ct.TrustRegionStrategyType.DOGLEG,
      "dogleg_type": ct.DoglegType.SUBSPACE_DOGLEG}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 25,
     {"use_inner_iterations": True}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float64", 25,
     {"use_mixed_precision_solves": True,
      "max_num_refinement_iterations": 2}),
    ("DENSE_SCHUR", "JACOBI", "NEVER", "float64", 25,
     {"use_mixed_precision_solves": True,
      "max_num_refinement_iterations": 2}),
    ("SPARSE_NORMAL_CHOLESKY", "JACOBI", "NEVER", "float64", 25,
     {"use_mixed_precision_solves": True,
      "max_num_refinement_iterations": 3}),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "ALWAYS", "float32", 30,
     {"use_explicit_schur_complement": True}),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "ALWAYS", "float32", 30,
     {"use_spse_initialization": True}),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 30,
     {"use_nonmonotonic_steps": True}),
    ("SPARSE_NORMAL_CHOLESKY", "JACOBI", "NEVER", "float64", 25,
     {"dynamic_sparsity": True}),
    ("CGNR", "SUBSET", "NEVER", "float64", 35, {"subset": True,
                                                 "eta": 1e-2}),
]


@pytest.mark.parametrize("solver,precond,fused,dtype,iters,extra", CONFIGS,
                         ids=[
                             f"{c[0]}-{c[1]}-{c[2]}-{c[3][-2:]}"
                             + ("-" + "-".join(sorted(
                                 k if not hasattr(v, "name") else v.name
                                 for k, v in c[5].items())) if c[5] else "")
                             for c in CONFIGS
                         ])
def test_reaches_golden_cost(solver, precond, fused, dtype, iters, extra):
    extra = dict(extra)
    user_ordering = extra.pop("user_ordering", False)
    bounds = extra.pop("bounds", False)
    subset = extra.pop("subset", False)

    if subset:
        # SUBSET preconditioner (subset_preconditioner.h:70;
        # solver.h:340-363): the subset must itself be a WELL-CONDITIONED
        # subproblem — dropping a row from a 2-3-observation point leaves
        # a nearly unconstrained direction and ruins the preconditioner
        # (measured: random 16/17 subsets give lambda_max(Q^-1 A) ~ 1e4).
        # Drop one observation only from points seen >= 6 times.
        bb = make_bench_bal()
        problem = bal.build_problem(bb)[0]
        rbs = problem.residual_blocks()
        counts = np.bincount(np.asarray(bb.point_index),
                             minlength=bb.num_points)
        seen_once = set()
        keep_ids = []
        for rb, pt in zip(rbs, np.asarray(bb.point_index)):
            if counts[pt] >= 6 and pt not in seen_once:
                seen_once.add(pt)  # drop this one observation
                continue
            keep_ids.append(rb.rb_id)
        extra["residual_blocks_for_subset_preconditioner"] = keep_ids
    else:
        problem = make_bench_problem()
        arrs = problem.parameter_block_arrays()
        cams_arr, pts_arr = arrs[0], arrs[1]

    if user_ordering:
        # points eliminated first, cameras second — the reference's
        # kUserOrdering axis (bundle_adjustment_test_util.h).
        extra["linear_solver_ordering"] = [[pts_arr], [cams_arr]]
    if bounds:
        # wide box that the optimum cannot touch: exercises the projected
        # step machinery without changing the answer.
        problem.set_parameter_block_array_bounds(
            cams_arr, lower=-1e8, upper=1e8)
        problem.set_parameter_block_array_bounds(
            pts_arr, lower=-1e8, upper=1e8)

    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType[solver],
        preconditioner_type=ct.PreconditionerType[precond],
        fused_loop=fused,
        evaluation_dtype=dtype,
        max_num_iterations=iters,
        max_linear_solver_iterations=100,
        **extra,
    )
    s = ct.solve(opts, problem)
    assert s.is_solution_usable(), s.message
    assert s.final_cost <= GOLDEN * (1 + 1e-4), (
        f"{solver}/{precond}: {s.final_cost} vs golden {GOLDEN}"
    )
    # FINAL-PARAMETER tolerance alongside cost for the f64 tiers (the
    # reference gate semantics, bundle_adjustment_test_util.h:30-95:
    # every config's final parameters match the DENSE_SCHUR single-
    # config reference within kMaxAbsoluteDifference = 1e-1... the
    # tolerance there is on parameters after identical normalization;
    # we use 1e-3 absolute, well inside the basin separation). f32
    # evaluation carries a ~4e-3 gradient noise floor near the optimum,
    # so only f64 configs face the parameter gate.
    if dtype == "float64" and not subset:
        ref_c, ref_p = _reference_final_parameters()
        assert np.abs(np.asarray(cams_arr.values) - ref_c).max() < 1e-3
        assert np.abs(np.asarray(pts_arr.values) - ref_p).max() < 1e-3


@functools.lru_cache(maxsize=1)
def _reference_final_parameters():
    """The single-config reference of the generated BA matrix: DENSE_SCHUR
    host-loop f64 (bundle_adjustment_test_util.h:30-95)."""
    problem = make_bench_problem()
    arrs = problem.parameter_block_arrays()
    s = ct.solve(ct.Options(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        fused_loop="NEVER", evaluation_dtype="float64",
        max_num_iterations=25, max_linear_solver_iterations=100), problem)
    assert s.is_solution_usable()
    return (np.array(arrs[0].values, copy=True),
            np.array(arrs[1].values, copy=True))


BAL_PATH = os.environ.get("CERES_TPU_BAL_PATH", "")


@pytest.mark.skipif(
    not BAL_PATH or not pathlib.Path(BAL_PATH).exists(),
    reason="set CERES_TPU_BAL_PATH to a BAL dataset "
           "(e.g. problem-16-22106-pre.txt; scripts/fetch_bal.sh)")
@pytest.mark.parametrize("solver,precond,fused", [
    ("SPARSE_SCHUR", "JACOBI", "NEVER"),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "NEVER"),
    ("DENSE_SCHUR", "JACOBI", "ALWAYS"),
])
def test_real_bal_final_parameter_tolerance(solver, precond, fused):
    """The REAL-dataset acceptance gate (bundle_adjustment_test_util.h:
    30-95): each configuration solves the actual BAL file and its final
    parameters must match the DENSE_SCHUR f64 host-loop reference within
    1e-4 — the reference's kResidualTolerance semantics. Runs wherever
    CERES_TPU_BAL_PATH points at a dataset (zero-egress CI images skip).
    """
    def solve_cfg(sv, pc, fl):
        b = bal.read_bal_file(BAL_PATH)
        problem, cams, pts = bal.build_problem_batched(b)
        s = ct.solve(ct.Options(
            linear_solver_type=ct.LinearSolverType[sv],
            preconditioner_type=ct.PreconditionerType[pc],
            fused_loop=fl, evaluation_dtype="float64",
            max_num_iterations=40, max_linear_solver_iterations=200),
            problem)
        assert s.is_solution_usable(), s.message
        return s, cams, pts

    key = "_real_bal_reference"
    ref = globals().get(key)
    if ref is None:
        ref = globals()[key] = solve_cfg("DENSE_SCHUR", "JACOBI", "NEVER")
    s_ref, ref_c, ref_p = ref
    s, c, p = solve_cfg(solver, precond, fused)
    assert s.final_cost <= s_ref.final_cost * (1 + 1e-4)
    assert np.abs(c - ref_c).max() < 1e-4
    assert np.abs(p - ref_p).max() < 1e-4


def test_sharded_mesh_reaches_golden_cost():
    """The 8-device sharded CGNR path (parallel/mesh.solve_sharded) at the
    bench shape — the thread-matrix axis of the reference's generated
    tests (threads=4 variants), realized as a device mesh."""
    from ceres_tpu.parallel.mesh import make_mesh, solve_sharded

    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType.CGNR,
        preconditioner_type=ct.PreconditionerType.JACOBI,
        evaluation_dtype="float64",
        max_num_iterations=35,
        max_linear_solver_iterations=100,
    )
    s = solve_sharded(opts, make_bench_problem(), mesh=make_mesh(8))
    assert s.final_cost <= GOLDEN * (1 + 1e-4), (
        f"sharded CGNR: {s.final_cost} vs golden {GOLDEN}"
    )


# ---------------------------------------------------------------------------
# Second shape: mixed block sizes (6-dof cameras + ONE shared 3-dof
# intrinsics block + 3-dof points) so the gate is not single-block-shape.
# Its golden is its own f64 host-loop DENSE_SCHUR result (the same
# reference-config-relative criterion the generated tests use).
# ---------------------------------------------------------------------------

def _make_mixed_problem():
    import jax
    import jax.numpy as jnp

    from ceres_tpu.cost_function import AutoDiffCostFunction
    from ceres_tpu.models.bal import angle_axis_rotate_point

    rng = np.random.default_rng(3)
    C, P = 12, 4000
    vis = 0.25
    cams = np.zeros((C, 6))
    cams[:, :3] = rng.standard_normal((C, 3)) * 0.1
    ang = np.linspace(0, 2 * np.pi, C, endpoint=False)
    cams[:, 3] = 0.5 * np.cos(ang)
    cams[:, 4] = 0.5 * np.sin(ang)
    cams[:, 5] = 10.0 + rng.uniform(-0.5, 0.5, C)
    intr = np.array([[500.0, 1e-7, 1e-13]])
    pts = rng.standard_normal((P, 3)) * 2.0
    seen = rng.random((P, C)) < vis
    seen[~seen.any(1), rng.integers(0, C, int((~seen.any(1)).sum()))] = True
    pt_idx, cam_idx = np.nonzero(seen)

    def residual(cam, shared, point, obs):
        p = angle_axis_rotate_point(cam[:3], point) + cam[3:6]
        xp, yp = -p[0] / p[2], -p[1] / p[2]
        r2 = xp * xp + yp * yp
        dist = 1.0 + r2 * (shared[1] + shared[2] * r2)
        return jnp.stack([shared[0] * dist * xp,
                          shared[0] * dist * yp]) - obs

    cost = AutoDiffCostFunction(residual, 2, [6, 3, 3],
                                name="shared_intrinsics")

    # ground-truth observations + noise, then perturb
    obs_clean = jax.vmap(
        lambda c, p: residual(c, jnp.asarray(intr[0]), p, jnp.zeros(2))
    )(jnp.asarray(cams[cam_idx]), jnp.asarray(pts[pt_idx]))
    obs = np.asarray(obs_clean) + 0.5 * rng.standard_normal(
        (len(pt_idx), 2))

    cams2 = cams + 0.01 * rng.standard_normal(cams.shape)
    pts2 = pts + 0.05 * rng.standard_normal(pts.shape)

    p = ct.Problem()
    cam_arr = p.add_parameter_block_array(np.ascontiguousarray(cams2))
    intr_arr = p.add_parameter_block_array(np.ascontiguousarray(intr.copy()))
    pt_arr = p.add_parameter_block_array(np.ascontiguousarray(pts2))
    p.add_residual_block_batch(
        cost, None,
        [(cam_arr, cam_idx), (intr_arr, np.zeros(len(pt_idx), np.int64)),
         (pt_arr, pt_idx)],
        data=obs,
    )
    return p


_MIXED_GOLDEN = {}


def _mixed_golden():
    if "v" not in _MIXED_GOLDEN:
        s = ct.solve(
            ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                       fused_loop="NEVER", evaluation_dtype="float64",
                       max_num_iterations=40),
            _make_mixed_problem(),
        )
        assert s.is_solution_usable()
        _MIXED_GOLDEN["v"] = s.final_cost
    return _MIXED_GOLDEN["v"]


@pytest.mark.parametrize("solver,precond,fused,dtype", [
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32"),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "NEVER", "float64"),
    ("SPARSE_NORMAL_CHOLESKY", "JACOBI", "NEVER", "float64"),
])
def test_mixed_block_sizes_reach_reference(solver, precond, fused, dtype):
    golden = _mixed_golden()
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType[solver],
        preconditioner_type=ct.PreconditionerType[precond],
        fused_loop=fused,
        evaluation_dtype=dtype,
        max_num_iterations=60,
        max_linear_solver_iterations=300,
        # the shared 3-dof intrinsics block couples every camera through
        # S; block-diagonal SCHUR_JACOBI needs a tight forcing sequence
        eta=1e-3,
    )
    s = ct.solve(opts, _make_mixed_problem())
    assert s.is_solution_usable(), s.message
    assert s.final_cost <= golden * (1 + 1e-4), (
        f"{solver}: {s.final_cost} vs mixed golden {golden}"
    )


def test_mixed_precision_schedule_reaches_golden():
    """evaluation_dtype='mixed' (f32 phase + f64 polish — the whole-solve
    mixed-precision tier, round-4 verdict #9) must reach the f64 golden
    cost within 1e-6 RELATIVE on the BAL-16 shape. This is the enforced
    accuracy bound the ~1e-6 claim used to carry only in docs."""
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            evaluation_dtype="mixed",
            max_num_iterations=40,
            max_linear_solver_iterations=100,
        ),
        make_bench_problem(),
    )
    assert s.is_solution_usable(), s.message
    assert s.final_cost <= GOLDEN * (1 + 1e-6), (
        f"mixed: {s.final_cost} vs golden {GOLDEN}")
