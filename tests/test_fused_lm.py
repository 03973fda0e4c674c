"""Fused one-jit LM loop (solvers/fused_lm.py) vs the host-loop minimizer.

The fused loop must reproduce the host loop's trajectory (same LM
semantics, same tolerances) — the analog of the reference's generated
config-matrix tests asserting every configuration matches a trusted
reference configuration (SURVEY.md §4.4)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal


def make_ba(seed=3, noise=0.1):
    b = bal.synthetic_bal(num_cameras=6, num_points=60, visibility=0.5,
                          noise=noise, seed=seed)
    bp = bal.perturb(b, 0.01, 0.05, 0.05)
    return bal.build_problem_batched(bp)[0]


def _solve_pair(opts_kwargs):
    host = ct.solve(
        ct.Options(fused_loop="NEVER", **opts_kwargs), make_ba()
    )
    fused = ct.solve(
        ct.Options(fused_loop="ALWAYS", **opts_kwargs), make_ba()
    )
    return host, fused


@pytest.mark.parametrize("lst", ["CGNR", "ITERATIVE_SCHUR", "DENSE_SCHUR"])
def test_fused_matches_host_trajectory(lst):
    host, fused = _solve_pair(
        dict(linear_solver_type=ct.LinearSolverType[lst], max_num_iterations=15)
    )
    assert fused.is_solution_usable()
    assert fused.termination_type == host.termination_type
    # identical device math => near-identical per-iteration costs
    n = min(len(host.iterations), len(fused.iterations))
    for ih, if_ in zip(host.iterations[:n], fused.iterations[:n]):
        if ih.cost == 0.0:  # host tolerance-break rows leave cost unset
            continue
        assert if_.cost == pytest.approx(ih.cost, rel=1e-9, abs=1e-12)
        assert if_.trust_region_radius == pytest.approx(
            ih.trust_region_radius, rel=1e-9
        )
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-8, abs=1e-12)
    assert fused.num_successful_steps == host.num_successful_steps


def test_fused_dense_qr():
    host, fused = _solve_pair(
        dict(linear_solver_type=ct.LinearSolverType.DENSE_QR,
             max_num_iterations=12)
    )
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-8, abs=1e-12)
    assert len(fused.iterations) == len(host.iterations)


def test_fused_f32_evaluation():
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   fused_loop="ALWAYS", evaluation_dtype="float32",
                   max_num_iterations=30),
        make_ba(),
    )
    assert s.is_solution_usable()
    s64 = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   fused_loop="NEVER", max_num_iterations=30),
        make_ba(),
    )
    assert abs(s.final_cost - s64.final_cost) < 1e-3 * max(1.0, s64.final_cost)


def test_fused_nonmonotonic():
    host, fused = _solve_pair(
        dict(linear_solver_type=ct.LinearSolverType.CGNR,
             use_nonmonotonic_steps=True, max_num_iterations=15)
    )
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-8, abs=1e-12)


def test_fused_identity_preconditioner():
    # unpreconditioned CG runs long Krylov recurrences, so the (algebraically
    # identical) scale-folded products accumulate different rounding than the
    # host path's materialized scaled J — compare at a looser tolerance
    host, fused = _solve_pair(
        dict(linear_solver_type=ct.LinearSolverType.CGNR,
             preconditioner_type=ct.PreconditionerType.IDENTITY,
             max_num_iterations=10)
    )
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-4)


def test_fused_spse_preconditioner():
    """SCHUR_POWER_SERIES_EXPANSION inside the fused ISC loop (the
    power_series_expansion_preconditioner.h:40-66 Neumann series applied
    with flat-lane Schur products) tracks the host path."""
    host, fused = _solve_pair(
        dict(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
             preconditioner_type=(
                 ct.PreconditionerType.SCHUR_POWER_SERIES_EXPANSION),
             max_num_spse_iterations=4, max_num_iterations=10)
    )
    assert fused.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-4)


def test_fused_spse_initialization():
    """use_spse_initialization (linear_solver.h:174-183): power-series
    initial guess for the Schur CG inside the fused loop."""
    fused = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
                   fused_loop="ALWAYS", use_spse_initialization=True,
                   max_num_spse_iterations=3, max_num_iterations=10),
        make_ba(),
    )
    base = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
                   fused_loop="ALWAYS", max_num_iterations=10),
        make_ba(),
    )
    assert fused.is_solution_usable()
    assert fused.final_cost == pytest.approx(base.final_cost, rel=1e-4)


def _make_bounded_ba():
    """BA problem with box bounds on the point blocks (forces the
    constrained path: projection in Plus + active-set masking +
    projected line search)."""
    b = bal.synthetic_bal(num_cameras=6, num_points=60, visibility=0.5,
                          noise=0.1, seed=3)
    bp = bal.perturb(b, 0.01, 0.05, 0.05)
    problem, cams, pts = bal.build_problem_batched(bp)
    lo = np.asarray(bp.points).min(axis=0) - 0.5
    hi = np.asarray(bp.points).max(axis=0) + 0.5
    arr = problem._block_arrays[1]  # the point ParameterBlockArray
    problem.set_parameter_block_array_bounds(arr, lower=lo, upper=hi)
    return problem


@pytest.mark.parametrize("lst", ["CGNR", "DENSE_SCHUR"])
def test_fused_bounds_matches_host(lst):
    """Bounds inside the fused loop (active-set mask + projected Armijo)
    track the host loop's constrained trajectory."""
    kw = dict(linear_solver_type=ct.LinearSolverType[lst],
              max_num_iterations=15)
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), _make_bounded_ba())
    fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), _make_bounded_ba())
    assert fused.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-6)
    # the solution respects the box
    assert host.is_constrained and fused.is_constrained


def test_fused_bounds_constrained_mgh():
    """Constrained More-Garbow-Hillstrom problems through the forced
    fused loop reach the same certified constrained minima as the host
    loop (the reference's bounds semantics)."""
    from ceres_tpu.models import mgh

    checked = 0
    for p in mgh.PROBLEMS:
        if p.constrained_optimal_cost is None:
            continue
        ok, achieved, s = mgh.solve_problem(
            p, constrained=True, trial=0,
            options_overrides=dict(fused_loop="ALWAYS"),
        )
        assert s.is_solution_usable()
        if ok:
            checked += 1
    assert checked >= 7  # host loop reaches 9/9; allow minor divergence


@pytest.mark.parametrize("pname", ["CLUSTER_JACOBI", "CLUSTER_TRIDIAGONAL"])
def test_fused_cluster_preconditioners(pname):
    """Visibility-clustered preconditioners inside the fused ISC loop
    (visibility_based_preconditioner.cc restriction assembled by the
    batched cluster assembler) track the host path."""
    kw = dict(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
              preconditioner_type=ct.PreconditionerType[pname],
              max_num_iterations=10)
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), make_ba())
    fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), make_ba())
    assert fused.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-4)


def test_fused_explicit_schur_complement():
    """use_explicit_schur_complement inside the fused loop (PCG on the
    explicitly assembled dense S, schur_complement_solver.cc:338) tracks
    the implicit-product fused path."""
    opts = dict(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
                fused_loop="ALWAYS", max_num_iterations=10)
    implicit = ct.solve(ct.Options(**opts), make_ba())
    explicit = ct.solve(
        ct.Options(use_explicit_schur_complement=True, **opts), make_ba()
    )
    assert explicit.is_solution_usable()
    assert explicit.final_cost == pytest.approx(implicit.final_cost, rel=1e-4)


def test_fused_max_iterations_termination():
    fused = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   fused_loop="ALWAYS", max_num_iterations=2,
                   function_tolerance=0.0, gradient_tolerance=0.0,
                   parameter_tolerance=0.0),
        make_ba(),
    )
    assert fused.termination_type == ct.TerminationType.NO_CONVERGENCE
    assert "Maximum number of iterations" in fused.message


def test_auto_threshold_picks_host_for_small_problems():
    """AUTO keeps small problems on the host loop (full feature coverage);
    this just asserts both routes solve and agree."""
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR,
                   max_num_iterations=15),  # AUTO, below threshold -> host
        make_ba(),
    )
    assert s.is_solution_usable()


def test_fused_pallas_tier_interpret():
    """The Mosaic segment-reduction tier (sorted rows + f32) matches the
    scatter tier, exercised via the interpret mode on CPU."""
    from ceres_tpu.ops import flatops as fo

    opts = dict(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                fused_loop="ALWAYS", evaluation_dtype="float32",
                max_num_iterations=6)
    base = ct.solve(ct.Options(**opts), make_ba())
    old = fo.PALLAS_MODE
    fo.PALLAS_MODE = "interpret"
    try:
        pal = ct.solve(ct.Options(**opts), make_ba())
    finally:
        fo.PALLAS_MODE = old
    assert pal.final_cost == pytest.approx(base.final_cost, rel=1e-4)


def test_fused_dense_schur_mixed_precision():
    """f32 factorization + f64 iterative refinement (the reference's
    use_mixed_precision_solves, dense_cholesky.h:198-249 pattern) tracks
    the full-f64 trajectory."""
    opts = dict(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                fused_loop="ALWAYS", max_num_iterations=12)
    full = ct.solve(ct.Options(**opts), make_ba())
    mixed = ct.solve(
        ct.Options(use_mixed_precision_solves=True,
                   max_num_refinement_iterations=2, **opts),
        make_ba(),
    )
    assert mixed.is_solution_usable()
    assert mixed.final_cost == pytest.approx(full.final_cost, rel=1e-5)


@pytest.mark.parametrize("lst,pre", [
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI"),
    ("ITERATIVE_SCHUR", "SCHUR_POWER_SERIES_EXPANSION"),
    ("CGNR", "JACOBI"),
])
def test_fused_kernel_matvec_matches_flatops(lst, pre):
    """The one-Pallas-kernel CG matvec (implicit_schur_matvec) reproduces
    the flat-ops product chain through the whole fused solve, exercised
    via interpret mode on CPU."""
    from ceres_tpu.ops import flatops as fo

    opts = dict(linear_solver_type=ct.LinearSolverType[lst],
                preconditioner_type=ct.PreconditionerType[pre],
                fused_loop="ALWAYS", evaluation_dtype="float32",
                max_num_iterations=6, max_linear_solver_iterations=8)
    base = ct.solve(ct.Options(**opts), make_ba())
    old = fo.PALLAS_MODE
    fo.PALLAS_MODE = "interpret"
    try:
        pal = ct.solve(ct.Options(**opts), make_ba())
    finally:
        fo.PALLAS_MODE = old
    assert pal.is_solution_usable()
    # f32 rounding differs between the kernel and the product chain; the
    # SPSE Neumann series amplifies it into slightly different (equally
    # valid) CG trajectories -> compare costs at trajectory tolerance.
    # (2e-3: the r5 transposed point-scatter changes summation order,
    # shifting the 6-iteration cost by ~1.2e-3 relative — to a LOWER
    # cost; the converged golden gate pins the real accuracy bar.)
    assert pal.final_cost == pytest.approx(base.final_cost, rel=2e-3)


@pytest.mark.parametrize("lst", ["DENSE_QR", "DENSE_SCHUR"])
def test_fused_dogleg_matches_host(lst):
    """Fused TRADITIONAL_DOGLEG (DoglegOpsWrapper inside the one-jit loop)
    reaches the host DoglegStrategy's solution quality."""
    kw = dict(
        linear_solver_type=ct.LinearSolverType[lst],
        trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
        max_num_iterations=25,
    )
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), make_ba())
    fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), make_ba())
    assert fused.is_solution_usable()
    assert host.is_solution_usable()
    # both must reach the same basin; the geometry is identical but host
    # scalar bookkeeping runs in numpy, so allow small drift
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-3,
                                             abs=1e-8)


@pytest.mark.parametrize("lst", ["DENSE_QR", "DENSE_SCHUR"])
def test_fused_dogleg_subspace_matches_host(lst):
    """Fused SUBSPACE_DOGLEG (2-D boundary problem solved in trig form
    inside the jit, dogleg_strategy.cc:719 role) reaches the host
    strategy's solution quality."""
    kw = dict(
        linear_solver_type=ct.LinearSolverType[lst],
        trust_region_strategy_type=ct.TrustRegionStrategyType.DOGLEG,
        dogleg_type=ct.DoglegType.SUBSPACE_DOGLEG,
        max_num_iterations=25,
    )
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), make_ba())
    fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), make_ba())
    assert fused.is_solution_usable()
    assert host.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-3,
                                             abs=1e-8)


@pytest.mark.parametrize("mode", ["NEVER", "ALWAYS"])
def test_inner_iterations_converge(mode):
    """use_inner_iterations (Ruhe & Wedin Algorithm II,
    coordinate_descent_minimizer.cc:130) on a BA problem: both the host
    loop and the fused in-jit CD sweep must stay usable and reach at
    least the plain-LM basin."""
    kw = dict(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
              max_num_iterations=12)
    plain = ct.solve(ct.Options(fused_loop=mode, **kw), make_ba())
    inner = ct.solve(
        ct.Options(fused_loop=mode, use_inner_iterations=True, **kw),
        make_ba(),
    )
    assert inner.is_solution_usable()
    assert inner.final_cost <= plain.final_cost * (1 + 1e-6)


def test_inner_iterations_fused_matches_host():
    """Fused inner iterations track the host implementation's quality."""
    kw = dict(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
              use_inner_iterations=True, max_num_iterations=12)
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), make_ba())
    fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), make_ba())
    assert fused.is_solution_usable() and host.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=1e-2,
                                             abs=1e-8)


@pytest.mark.slow
def test_jt_mode_matches_host_loop():
    """jt-mode (fused Pallas evaluation + scale-folded kernel suite,
    interpret): the ITERATIVE_SCHUR f32 pipeline with eval_fused must
    match the host-loop f64 reference to f32 evaluation tolerance."""
    import ceres_tpu as ct
    from ceres_tpu.ops import flatops
    from ceres_tpu.models import bal
    from ceres_tpu.solvers import fused_lm

    old = flatops.PALLAS_MODE
    flatops.PALLAS_MODE = "interpret"
    try:
        b0 = bal.synthetic_bal(num_cameras=6, num_points=80, visibility=0.4,
                               noise=1.0, seed=0)

        def mk():
            p, _, _ = bal.build_problem_batched(
                bal.perturb(b0, 0.02, 0.1, 0.1, seed=1))
            return p

        opts = ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            fused_loop="ALWAYS", max_num_iterations=15,
            evaluation_dtype="float32")
        # assert the jt path is actually taken (not silently skipped)
        from ceres_tpu.program import CompiledProgram
        from ceres_tpu.utils import ordering as om
        prog = CompiledProgram(mk(), compute_dtype="float32")
        ops = fused_lm.IterativeSchurStepOps(
            prog, opts, om.eligible_e_sets(prog))
        assert ops._jt_qual is not None

        s = ct.solve(opts, mk())
        s_ref = ct.solve(ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            fused_loop="NEVER", max_num_iterations=15), mk())
        assert abs(s.final_cost - s_ref.final_cost) / s_ref.final_cost < 5e-3
    finally:
        flatops.PALLAS_MODE = old


@pytest.mark.slow
@pytest.mark.parametrize("loss_name", ["huber", "cauchy"])
def test_jt_mode_loss_matches_host_loop(loss_name):
    """jt-mode with a robust loss: the Triggs corrector folded into
    eval_fused (corrector.cc:41-111 in-kernel) must match the legacy
    host-loop path (loss.correct_residuals_and_jacobians) both at the
    first evaluation (cost = 0.5 sum rho) and at the solved cost."""
    import ceres_tpu as ct
    from ceres_tpu.ops import flatops
    from ceres_tpu.models import bal
    from ceres_tpu.solvers import fused_lm
    from ceres_tpu.loss import HuberLoss, CauchyLoss

    loss = {"huber": HuberLoss(1.0), "cauchy": CauchyLoss(0.5)}[loss_name]
    old = flatops.PALLAS_MODE
    flatops.PALLAS_MODE = "interpret"
    try:
        b0 = bal.synthetic_bal(num_cameras=6, num_points=80, visibility=0.4,
                               noise=1.0, seed=0)

        def mk():
            p, _, _ = bal.build_problem_batched(
                bal.perturb(b0, 0.02, 0.1, 0.1, seed=1), loss=loss)
            return p

        opts = ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            fused_loop="ALWAYS", max_num_iterations=15,
            evaluation_dtype="float32")
        from ceres_tpu.program import CompiledProgram
        from ceres_tpu.utils import ordering as om
        prog = CompiledProgram(mk(), compute_dtype="float32")
        ops = fused_lm.IterativeSchurStepOps(
            prog, opts, om.eligible_e_sets(prog))
        assert ops._jt_qual is not None  # loss must not disqualify jt-mode
        ops.prepare_invariants()
        x = prog.initial_state()
        cost_jt, r_jt, v_jt = ops.evaluate(x)
        o = prog._eval_core(x, True, False, need_grad=False)
        assert float(cost_jt) == pytest.approx(float(o["cost"]), rel=1e-5)
        # gradient/scaling parity vs the legacy corrected evaluation
        # (correct_residuals_and_jacobians): the corrector itself
        g_jt, sqn_jt, _ = ops.post_eval(v_jt, r_jt)
        import numpy as np
        from ceres_tpu.ops import flatops as fo_mod
        vflat = tuple(tuple(rr) for rr in ops.flat.flatten(o["block_jacs"]))
        g_e, sqn_e, _ = ops.flat.fused_post_eval_e(vflat, o["residuals"])
        g_f, sqn_f, _ = ops.flat.fused_post_eval_f(vflat, o["residuals"],
                                                   with_blocks=False)
        g_ref = ops.pt.combine(ops.pm, g_e, g_f)
        gs = max(1e-12, float(np.max(np.abs(np.asarray(g_ref)))))
        assert np.max(np.abs(np.asarray(g_jt) - np.asarray(g_ref))) / gs < 1e-4

        # Trajectory parity: robust-loss systems are near-singular along
        # outlier directions (sqrt(rho') -> small), so equally-good f32
        # steps diverge; cauchy gets the looser bound.
        tol = {"huber": 5e-3, "cauchy": 2e-2}[loss_name]
        s = ct.solve(opts, mk())
        s_ref = ct.solve(ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            fused_loop="NEVER", max_num_iterations=15), mk())
        assert abs(s.final_cost - s_ref.final_cost) / s_ref.final_cost < tol
    finally:
        flatops.PALLAS_MODE = old


def make_quat_ba(n_cams=6, n_pts=80, seed=0):
    from ceres_tpu.models import bal

    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=0.5, noise=0.5, seed=seed)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.1,
                    point_sigma=0.1, seed=seed + 1)
    p, _, _ = bal.build_problem_batched_quat(b)
    return p


def test_jt_mode_quaternion_manifold_parity():
    """jt-mode manifold chain rule (eval_fused pj_cols): a quaternion-
    camera BA (ProductManifold(Quaternion, Euclidean(6)), 10 ambient /
    9 tangent) must QUALIFY for the fused evaluation kernel and match
    the host evaluation — cost 1e-5, gradient 1e-4 (round-4 verdict #2;
    reference semantics: the unconditional manifold chain rule at
    residual_block.cc:70-196)."""
    from ceres_tpu.ops import bsr, flatops as fo, partition as pt_mod
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.utils import ordering as om

    p = make_quat_ba()
    prog = CompiledProgram(p, compute_dtype="float32")
    pm = pt_mod.build_partition(bsr.build_meta(prog),
                                om.eligible_e_sets(prog))
    old = fo.PALLAS_MODE
    fo.PALLAS_MODE = "interpret"
    try:
        fl = fo.FlatSchurOps(pm)
        q = fl.eval_kernel_qual(prog)
        assert q is not None, "quaternion BA must qualify for jt-mode"
        inv = fl.eval_invariants(prog, q)
        x = prog.initial_state()
        cost, rt, jt = fl.eval_fused_x(prog, q, inv, x)
        o = prog._eval_core(x, True, True)
        assert float(cost) == pytest.approx(float(o["cost"]), rel=1e-5)
        g_e, _, _, g_f, _ = fl.post_eval_kernel_jt(
            jt, rt, inv["ids_T"], masks=inv["masks"])
        g_k = np.asarray(pt_mod.combine(pm, jnp.asarray(g_e),
                                        jnp.asarray(g_f)))
        g_host = np.asarray(o["gradient"])
        rel = np.abs(g_k - g_host).max() / np.abs(g_host).max()
        assert rel < 1e-4, rel
    finally:
        fo.PALLAS_MODE = old


def test_jt_mode_quaternion_solve_matches_host():
    """End-to-end fused LM on the quaternion-camera BA tracks the host
    loop's final cost, and quaternions stay unit-norm."""
    kw = dict(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
              evaluation_dtype="float32", max_num_iterations=8)
    host = ct.solve(ct.Options(fused_loop="NEVER", **kw), make_quat_ba())
    import ceres_tpu.ops.flatops as fo
    old = fo.PALLAS_MODE
    fo.PALLAS_MODE = "interpret"
    try:
        pq = make_quat_ba()
        fused = ct.solve(ct.Options(fused_loop="ALWAYS", **kw), pq)
    finally:
        fo.PALLAS_MODE = old
    assert fused.is_solution_usable() and host.is_solution_usable()
    assert fused.final_cost == pytest.approx(host.final_cost, rel=2e-3,
                                             abs=1e-8)


def test_jt_mode_multitile_gradient_parity():
    """Round-5 regression: multi-TILE jt-mode evaluation. The lane-aligned
    tile windows reach back into the previous tile's rows; basing the
    point gather at block0[t] evaluated those boundary rows against the
    wrong points — every earlier test used single-tile problems, so the
    bug only surfaced at real scale (gradient rel err 14 on TPU, f32
    solves stalled ~350x above golden). The fix (plan width cap +
    row_tile_gather_bases + in-kernel one-hot at the base) must hold the
    jt gradient to f32 parity on a problem with MANY tiles."""
    from ceres_tpu.ops import bsr, flatops as fo, partition as pt_mod
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.utils import ordering as om
    from ceres_tpu.models import bal

    b = bal.synthetic_bal(num_cameras=8, num_points=1200, visibility=0.1,
                          noise=0.5, seed=0)
    b = bal.perturb(b, 0.02, 0.1, 0.1, seed=1)
    p = bal.build_problem_batched(b)[0]
    prog = CompiledProgram(p, compute_dtype="float32")
    pm = pt_mod.build_partition(bsr.build_meta(prog),
                                om.eligible_e_sets(prog))
    old = fo.PALLAS_MODE
    fo.PALLAS_MODE = "interpret"
    try:
        fl = fo.FlatSchurOps(pm)
        q = fl.eval_kernel_qual(prog)
        assert q is not None
        assert len(q[0].rplan[1]) - 1 >= 8, "needs a multi-tile plan"
        inv = fl.eval_invariants(prog, q)
        x = prog.initial_state()
        cost, rt, jt = fl.eval_fused_x(prog, q, inv, x)
        g_e, _, _, g_f, _ = fl.post_eval_kernel_jt(
            jt, rt, inv["ids_T"], masks=inv["masks"])
        g_jt = np.asarray(pt_mod.combine(pm, jnp.asarray(g_e),
                                         jnp.asarray(g_f)))
        o = prog._eval_core(x, True, False, need_grad=True)
        g32 = np.asarray(o["gradient"])
        rel = np.abs(g_jt - g32).max() / np.abs(g32).max()
        assert rel < 1e-4, rel
        assert float(cost) == pytest.approx(float(o["cost"]), rel=1e-5)
    finally:
        fo.PALLAS_MODE = old
