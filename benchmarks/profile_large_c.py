"""Stage split of the large-C (Venice-shape) generic fused
ITERATIVE_SCHUR+SCHUR_JACOBI iteration: evaluate / post_eval /
compute_step(cg=1) / compute_step(cg=10). Differences isolate the
SCHUR_JACOBI assembly (+rhs/backsub) from the per-CG-matvec cost.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_large_c.py
"""
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

K = 2


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def timed(name, make_fn, *args):
    times = {}
    for mult in (1, 2):
        fn = jax.jit(make_fn(K * mult))
        _sync(fn(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[mult] = best
    per = (times[2] - times[1]) / K
    print(f"{name:30s} {per * 1e3:9.2f} ms/iter", flush=True)
    return per


def main():
    b = bal.synthetic_bal_large(num_cameras=13696, num_points=1_000_000,
                                mean_track=4.4, cam_window=60, seed=0)
    b = bal.perturb(b, rotation_sigma=0.01, translation_sigma=0.1,
                    point_sigma=0.1, seed=1)
    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem, compute_dtype="float32")
    x0 = prog.initial_state()
    print(f"# C={b.num_cameras} P={b.num_points} obs={b.num_observations} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    def make_ops(li):
        opts = ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.SCHUR_JACOBI,
            evaluation_dtype="float32", fused_loop="ALWAYS",
            max_num_iterations=K, function_tolerance=0.0,
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            min_trust_region_radius=0.0,
            max_linear_solver_iterations=li,
            min_linear_solver_iterations=li,
        )
        return fused_lm.IterativeSchurStepOps(prog, opts,
                                              om.eligible_e_sets(prog))

    ops1 = make_ops(1)
    ops10 = make_ops(10)

    def mk_eval(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                cost, r, vrep = ops1.evaluate(x)
                return x + 1e-30 * cost.astype(x.dtype), acc + r[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    def mk_posteval(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                cost, r, vrep = ops1.evaluate(x)
                g, sqn, aux = ops1.post_eval(vrep, r)
                return x + 1e-30 * cost.astype(x.dtype), acc + g[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float64(0)))[1]
        return f

    def mk_step(ops):
        def mk(k):
            def f(x):
                def body(i, carry):
                    x, acc = carry
                    cost, r, vrep = ops.evaluate(x)
                    g, sqn, aux = ops.post_eval(vrep, r)
                    scale = 1.0 / (1.0 + jnp.sqrt(sqn.astype(jnp.float64)))
                    sc = scale.astype(jnp.float32)
                    D2 = (sqn.astype(jnp.float64) * scale * scale / 1e4
                          ).astype(jnp.float32) + 1e-8
                    step, mcc, ni = ops.compute_step(vrep, aux, g, r, sc, D2)
                    return x + 1e-30 * mcc.astype(x.dtype), acc + step[0]
                return jax.lax.fori_loop(0, k, body, (x, jnp.float64(0)))[1]
            return f
        return mk

    t_eval = timed("evaluate", mk_eval, x0)
    t_pe = timed("  + post_eval", mk_posteval, x0)
    t_s1 = timed("  + step(cg=1)", mk_step(ops1), x0)
    t_s10 = timed("  + step(cg=10)", mk_step(ops10), x0)
    print(f"\ndeltas: eval {t_eval*1e3:.1f} | post_eval "
          f"{(t_pe-t_eval)*1e3:.1f} | SJ-assembly+rhs+backsub+1mv "
          f"{(t_s1-t_pe)*1e3:.1f} | 9 extra matvecs "
          f"{(t_s10-t_s1)*1e3:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
