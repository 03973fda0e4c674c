"""Stage-level timing of the GENERIC fused DENSE_SCHUR LM iteration on the
BAL-16 bench shape: evaluate (_eval_core + flatten) / post_eval /
compute_step / full loop body. Each stage is timed as a k-vs-2k in-jit
fori_loop marginal (single-dispatch timing is meaningless through this
tunnel), with a tiny feedback term so XLA cannot dead-code or hoist the
loop body.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_generic_stages.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.program import CompiledProgram
from ceres_tpu.solvers import fused_lm
from ceres_tpu.utils import ordering as om

K = 10


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def timed(name, make_fn, *args):
    times = {}
    for mult in (1, 2):
        fn = jax.jit(make_fn(K * mult))
        _sync(fn(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[mult] = best
    per = (times[2] - times[1]) / K
    print(f"{name:34s} {per * 1e3:8.3f} ms/iter  "
          f"(K {times[1]*1e3:.1f} ms, 2K {times[2]*1e3:.1f} ms)")
    return per


def main():
    n_cams, n_pts, target_obs = 16, 22106, 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem, compute_dtype="float32")
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
        evaluation_dtype="float32", fused_loop="ALWAYS",
        max_num_iterations=K, function_tolerance=0.0,
        gradient_tolerance=0.0, parameter_tolerance=0.0,
        min_trust_region_radius=0.0,
    )
    ops = fused_lm.DenseSchurStepOps(prog, opts, om.eligible_e_sets(prog))
    x0 = prog.initial_state()
    print(f"# device={jax.devices()[0].device_kind} "
          f"obs={b.num_observations} kernel_qual="
          f"{ops._kernel_qual(ops.evaluate(x0)[2]) is not None}")

    T = prog.tangent_size

    def mk_eval(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                cost, r, vrep = ops.evaluate(x)
                return x + 1e-30 * cost.astype(x.dtype), acc + r[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    def mk_posteval(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                cost, r, vrep = ops.evaluate(x)
                g, sqn, aux = ops.post_eval(vrep, r)
                return x + 1e-30 * cost.astype(x.dtype), acc + g[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float64(0)))[1]
        return f

    def mk_step(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                cost, r, vrep = ops.evaluate(x)
                g, sqn, aux = ops.post_eval(vrep, r)
                scale = (1.0 / (1.0 + jnp.sqrt(sqn.astype(jnp.float64))))
                sc = scale.astype(jnp.float32)
                D2 = (sqn.astype(jnp.float64) * scale * scale / 1e4
                      ).astype(jnp.float32) + 1e-8
                step, mcc, ni = ops.compute_step(vrep, aux, g, r, sc, D2)
                return x + 1e-30 * mcc.astype(x.dtype), acc + step[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float64(0)))[1]
        return f

    t_eval = timed("evaluate (_eval_core+flatten)", mk_eval, x0)
    t_pe = timed("  + post_eval", mk_posteval, x0)
    t_st = timed("  + compute_step", mk_step, x0)
    print(f"\nstage deltas: evaluate {t_eval*1e3:.3f}  "
          f"post_eval {(t_pe-t_eval)*1e3:.3f}  "
          f"compute_step {(t_st-t_pe)*1e3:.3f} ms/iter")

    # full public fused minimize marginal for comparison
    from ceres_tpu.solvers.fused_lm import build_fused_minimizer
    from ceres_tpu.summary import Summary

    def fused_time(iters):
        o = ct.Options(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
            evaluation_dtype="float32", fused_loop="ALWAYS",
            max_num_iterations=iters, function_tolerance=0.0,
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            min_trust_region_radius=0.0,
        )
        fzd = build_fused_minimizer(prog, o, "schur_dense",
                                    e_families=om.eligible_e_sets(prog))
        fzd.minimize(x0, Summary())
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            fzd.minimize(x0, Summary())
            best = min(best, time.perf_counter() - t0)
        return best

    tK, t2K = fused_time(K), fused_time(2 * K)
    print(f"full fused minimize marginal       {(t2K-tK)/K*1e3:8.3f} ms/iter")


if __name__ == "__main__":
    main()
