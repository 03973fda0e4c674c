"""Benchmark: BAL-shaped bundle adjustment on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary fields. Workload mirrors BASELINE.md config 3/4: a synthetic BAL
instance shaped like problem-16-22106 (16 cameras, 22106 points, ~83k
observations), solved with the sharded LM step (matrix-free PCG inner
loop). Also reports block-SpMV throughput in nnz/s.

The reference publishes no end-to-end numbers (SURVEY.md §6);
vs_baseline is therefore measured against this repo's recorded first-round
value (bench_baseline.json) once it exists, else 1.0.
"""
import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba

    dtype = jnp.float32  # TPU-native precision for the hot path
    n_cams, n_pts = 16, 22106
    target_obs = 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts, visibility=vis,
                          noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    n_obs = b.num_observations
    nnz = n_obs * 2 * 12  # per-obs 2x9 + 2x3 blocks

    # Observations sorted by point: the point-side segment reductions and
    # gathers then run as the Mosaic tiled one-hot kernels
    # (ops/pallas_kernels.py) instead of XLA scatter/gather. Points are
    # RENUMBERED so each 128-point tile carries ~equal rows (LPT deal,
    # pallas_kernels.balanced_block_order) — the kernels' static row
    # budget then sits at the mean instead of the heaviest tile.
    from ceres_tpu.ops import pallas_kernels as pk

    new_id = pk.balanced_block_order(np.asarray(b.point_index), n_pts)
    pt_idx_new = new_id[np.asarray(b.point_index)]
    order = np.argsort(pt_idx_new, kind="stable")
    cams = jnp.asarray(b.cameras, dtype)
    pts = jnp.asarray(np.asarray(b.points)[np.argsort(new_id)], dtype)
    cam_idx = jnp.asarray(np.asarray(b.camera_index)[order])
    pt_idx = jnp.asarray(pt_idx_new[order])
    obs = jnp.asarray(np.asarray(b.observations)[order], dtype)

    import functools

    # exact dense-Schur LM step (points eliminated in closed form; the
    # 9C x 9C reduced system is Cholesky-solved — no CG loop); see
    # parallel/sharded_ba.lm_step_schur.
    from ceres_tpu.ops import pallas_kernels as pk

    plan = pk.plan_block_tiles(np.asarray(pt_idx), n_pts)
    radius = jnp.asarray(1e4, dtype)

    # k LM iterations fused per jit call (the evaluation carry keeps the
    # flat J compiler-internal between iterations). Fall back to the
    # scatter path off-TPU.
    K = 20
    step = jax.jit(functools.partial(sharded_ba.lm_step_schur_k, k=K,
                                     pallas_plan=plan))
    st = sharded_ba.BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
    try:
        st = sharded_ba.BAState(*step(st.cams, st.pts, cam_idx, pt_idx, obs, st.radius))
        jax.block_until_ready(st)
    except Exception:
        step = jax.jit(functools.partial(sharded_ba.lm_step_schur_k, k=K))
        st = sharded_ba.BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
        st = sharded_ba.BAState(*step(st.cams, st.pts, cam_idx, pt_idx, obs, st.radius))
        jax.block_until_ready(st)

    calls = 4
    t0 = time.perf_counter()
    for _ in range(calls):
        st = sharded_ba.BAState(
            *step(st.cams, st.pts, cam_idx, pt_idx, obs, st.radius)
        )
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    lm_per_sec = calls * K / dt

    # SpMV benchmark: J v with the per-obs blocks (the CGNR hot op).
    r, Jc, Jp = jax.jit(sharded_ba._evaluate)(cams, pts, cam_idx, pt_idx, obs)
    jax.block_until_ready((Jc, Jp))
    vc = jnp.ones_like(cams)
    vp = jnp.ones_like(pts)
    D2c = jnp.ones_like(cams)
    D2p = jnp.ones_like(pts)
    mv = jax.jit(sharded_ba._jtj_matvec, static_argnums=())
    out = mv(Jc, Jp, cam_idx, pt_idx, vc, vp, D2c, D2p)
    jax.block_until_ready(out)
    n_mv = 50
    t0 = time.perf_counter()
    for _ in range(n_mv):
        out = mv(Jc, Jp, cam_idx, pt_idx, out[0], out[1], D2c, D2p)
    jax.block_until_ready(out)
    dt_mv = time.perf_counter() - t0
    # each matvec does J v and J^T u => 2 * nnz mults
    nnz_per_sec = 2 * nnz * n_mv / dt_mv

    # Generic public-API path: the fused one-jit LM loop (DENSE_SCHUR step)
    # over the same problem built through Problem/CompiledProgram — measures
    # the framework, not the specialized kernel.
    generic_lm_per_sec = None
    try:
        import ceres_tpu as ct
        from ceres_tpu.program import CompiledProgram
        from ceres_tpu.solvers.fused_lm import build_fused_minimizer
        from ceres_tpu.summary import Summary
        from ceres_tpu.utils import ordering as om

        problem, _, _ = bal.build_problem_batched(b)
        opts = ct.Options(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
            evaluation_dtype="float32", fused_loop="ALWAYS",
            max_num_iterations=20, function_tolerance=0.0,
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            min_trust_region_radius=0.0,
        )
        prog = CompiledProgram(problem, compute_dtype="float32")
        fused = build_fused_minimizer(
            prog, opts, "schur_dense", e_families=om.eligible_e_sets(prog)
        )
        x0 = prog.initial_state()
        fused.minimize(x0, Summary())  # compile + warm
        t0 = time.perf_counter()
        fused.minimize(x0, Summary())
        generic_lm_per_sec = opts.max_num_iterations / (time.perf_counter() - t0)
    except Exception:
        pass

    baseline_path = pathlib.Path(__file__).parent / "bench_baseline.json"
    vs = 1.0
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        if base.get("value"):
            vs = lm_per_sec / base["value"]

    print(
        json.dumps(
            {
                "metric": "BAL(16cam,22106pt,83k obs) LM iterations/sec, exact dense-Schur step",
                "value": round(lm_per_sec, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs, 3),
                "spmv_nnz_per_sec": round(nnz_per_sec / 1e9, 3),
                "spmv_unit": "Gnnz/s",
                "generic_fused_lm_it_per_s": (
                    round(generic_lm_per_sec, 3) if generic_lm_per_sec else None
                ),
                "final_cost": float(st.cost),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
