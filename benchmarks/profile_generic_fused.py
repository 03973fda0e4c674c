"""Per-path it/s for the GENERIC public-API fused LM loop on the BAL-16
shape: DENSE_SCHUR / ITERATIVE_SCHUR(SCHUR_JACOBI) / ITERATIVE_SCHUR(SPSE)
/ CGNR(JACOBI). The marginal cost between max_num_iterations=K and 2K
isolates the per-iteration loop body from dispatch + iteration-zero work
(same method as profile_marginal.py).

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_generic_fused.py
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=22106)
    ap.add_argument("--target_obs", type=int, default=83718)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--paths", default="dense_schur,isc_jacobi,isc_spse,cgnr")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.fused_lm import build_fused_minimizer
    from ceres_tpu.summary import Summary
    from ceres_tpu.utils import ordering as om

    vis = args.target_obs / (args.num_cameras * args.num_points)
    b = bal.synthetic_bal(num_cameras=args.num_cameras,
                          num_points=args.num_points, visibility=vis,
                          noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    print(f"# {args.num_cameras} cams x {args.num_points} pts, "
          f"{b.num_observations} obs, device={jax.devices()[0].device_kind}")

    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem, compute_dtype="float32")
    x0 = prog.initial_state()

    def opts_for(k, **kw):
        return ct.Options(
            evaluation_dtype="float32", fused_loop="ALWAYS",
            max_num_iterations=k, function_tolerance=0.0,
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            min_trust_region_radius=0.0, **kw,
        )

    cfgs = {
        "dense_schur": ("schur_dense", dict(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR)),
        "isc_jacobi": ("schur_iterative", dict(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            max_linear_solver_iterations=10,
            min_linear_solver_iterations=10)),
        "isc_spse": ("schur_iterative", dict(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=(
                ct.PreconditionerType.SCHUR_POWER_SERIES_EXPANSION),
            max_linear_solver_iterations=10,
            min_linear_solver_iterations=10)),
        "cgnr": ("bsr", dict(
            linear_solver_type=ct.LinearSolverType.CGNR,
            preconditioner_type=ct.PreconditionerType.JACOBI,
            max_linear_solver_iterations=10,
            min_linear_solver_iterations=10)),
    }

    K = args.k
    for name in args.paths.split(","):
        kind, kw = cfgs[name]
        times = {}
        final_cost = None
        for mult in (1, 2):
            opts = opts_for(K * mult, **kw)
            e_fams = om.eligible_e_sets(prog) if kind != "bsr" else None
            fused = build_fused_minimizer(
                prog, opts, kind,
                **({"e_families": e_fams} if e_fams is not None else {}),
            )
            s = Summary()
            fused.minimize(x0, s)  # compile + warm
            best = 1e9
            for _ in range(3):
                s = Summary()
                t0 = time.perf_counter()
                fused.minimize(x0, s)
                best = min(best, time.perf_counter() - t0)
            times[mult] = best
            final_cost = s.final_cost
        per = (times[2] - times[1]) / K
        print(f"{name:14s} {per*1e3:8.3f} ms/iter  {1.0/per:8.1f} it/s  "
              f"(K{K} {times[1]*1e3:.1f} ms, K{2*K} {times[2]*1e3:.1f} ms, "
              f"final_cost {final_cost:.6g})")


if __name__ == "__main__":
    main()
