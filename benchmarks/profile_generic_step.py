"""Sub-stage split of the generic DENSE_SCHUR _compute_step_kernel on the
BAL-16 shape: prep_matvec_rows / schur_assembly kernel / S solve /
back-substitution. fori-loop marginals (k vs 2k) with feedback.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_generic_step.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.ops import flatops as fo
from ceres_tpu.ops import pallas_kernels as pk
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
    print(f"{name:34s} {per * 1e3:8.3f} ms/iter", flush=True)
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
        max_num_iterations=K)
    ops = fused_lm.DenseSchurStepOps(prog, opts, om.eligible_e_sets(prog))
    x0 = prog.initial_state()
    cost, r0, vrep0 = ops.evaluate(x0)
    g0, sqn0, aux0 = ops.post_eval(vrep0, r0)
    q = ops._kernel_qual(vrep0)
    print(f"# kernel_qual={q is not None}", flush=True)
    pe, pf = q
    fl, pm, pt = ops.flat, ops.pm, ops.pt
    kind = fl.kinds[0]
    scale64 = 1.0 / (1.0 + jnp.sqrt(sqn0.astype(jnp.float64)))
    sc0 = scale64.astype(jnp.float32)
    D20 = (sqn0.astype(jnp.float64) * scale64 * scale64 / 1e4
           ).astype(jnp.float32) + 1e-8

    # Stage A: evaluate + flatten only (baseline feedback)
    def mk_eval(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                c, r, vrep = ops.evaluate(x)
                return x + 1e-30 * c.astype(x.dtype), acc + vrep[0][pf.s][0, 0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    # Stage B: + prep_matvec_rows
    P, C, te, tf = pe.nv, pf.nv, pe.t, pf.t
    max_rows = pe.rplan[2]

    def mk_prep(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                c, r, vrep = ops.evaluate(x)
                JT, ids_T = pk.prep_matvec_rows(
                    vrep[0][pf.s], vrep[0][pe.s], pe.local, pf.local,
                    max_rows, kind.r, tf, te)
                return x + 1e-30 * c.astype(x.dtype), acc + JT[0, 0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    # Stage C: + scaled_K + kernel (no solve)
    def mk_kernel(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                c, r, vrep = ops.evaluate(x)
                g, sqn, aux = ops.post_eval(vrep, r)
                ete, _ = aux
                se = pt.extract_e(pm, sc0)
                d2e = pt.extract_e(pm, D20)
                sf = pt.extract_f(pm, sc0)
                K_e = ops._scaled_K(ete, se, d2e)
                bvec = sc0 * g
                u_vec = ops._kmatvec(K_e, pt.extract_e(pm, bvec))
                JT, ids_T = pk.prep_matvec_rows(
                    vrep[0][pf.s], vrep[0][pe.s], pe.local, pf.local,
                    max_rows, kind.r, tf, te)
                BT = pk.BLOCKS_PER_TILE
                dt = jnp.float32
                gf = max(8, -(-tf // 8) * 8)
                pw = jnp.zeros((P + 1 + BT, 128), dt)
                pw = jax.lax.dynamic_update_slice(
                    pw, se.reshape(P, te), (0, 0))
                pw = jax.lax.dynamic_update_slice(pw, K_e[0], (0, 8))
                pw = jax.lax.dynamic_update_slice(
                    pw, u_vec.reshape(P, te), (0, 24))
                C_pad = max(128, -(-(C + 1) // 128) * 128)
                sc_T = jnp.zeros((gf, C_pad), dt)
                sc_T = jax.lax.dynamic_update_slice(
                    sc_T, sf.reshape(C, tf).T, (0, 0))
                t_full = C * tf
                per_tile = max_rows * t_full * 2 * 2 + max_rows * 48 * 4
                unroll = max(1, min(4, (2 << 20) // max(per_tile, 1)))
                ata, ftf, U = pk.schur_assembly(
                    JT, ids_T, sc_T, pw, pe.rplan[0], pe.rplan[1], P, C,
                    kind.r, tf, te, max_rows=max_rows, unroll=unroll)
                return x + 1e-30 * c.astype(x.dtype), acc + ata[0, 0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    # Stage C2: post_eval + scaled_K + kmatvec + pw/sc_T staging (no kernel)
    def mk_K(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                c, r, vrep = ops.evaluate(x)
                g, sqn, aux = ops.post_eval(vrep, r)
                ete, _ = aux
                se = pt.extract_e(pm, sc0)
                d2e = pt.extract_e(pm, D20)
                sf = pt.extract_f(pm, sc0)
                K_e = ops._scaled_K(ete, se, d2e)
                bvec = sc0 * g
                u_vec = ops._kmatvec(K_e, pt.extract_e(pm, bvec))
                BT = pk.BLOCKS_PER_TILE
                dt = jnp.float32
                gf = max(8, -(-tf // 8) * 8)
                pw = jnp.zeros((P + 1 + BT, 128), dt)
                pw = jax.lax.dynamic_update_slice(
                    pw, se.reshape(P, te), (0, 0))
                pw = jax.lax.dynamic_update_slice(pw, K_e[0], (0, 8))
                pw = jax.lax.dynamic_update_slice(
                    pw, u_vec.reshape(P, te), (0, 24))
                C_pad = max(128, -(-(C + 1) // 128) * 128)
                sc_T = jnp.zeros((gf, C_pad), dt)
                sc_T = jax.lax.dynamic_update_slice(
                    sc_T, sf.reshape(C, tf).T, (0, 0))
                return x + 1e-30 * c.astype(x.dtype), acc + pw[0, 0] + sc_T[0, 0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))[1]
        return f

    # Stage D: full compute_step
    def mk_full(k):
        def f(x):
            def body(i, carry):
                x, acc = carry
                c, r, vrep = ops.evaluate(x)
                g, sqn, aux = ops.post_eval(vrep, r)
                step, mcc, ni = ops.compute_step(vrep, aux, g, r, sc0, D20)
                return x + 1e-30 * c.astype(x.dtype), acc + step[0]
            return jax.lax.fori_loop(0, k, body, (x, jnp.float64(0)))[1]
        return f

    tA = timed("eval+flatten", mk_eval, x0)
    tB = timed("  + prep_matvec_rows", mk_prep, x0)
    tK = timed("  + post_eval+K staging", mk_K, x0)
    tC = timed("  + post_eval+K+kernel", mk_kernel, x0)
    tD = timed("  + full compute_step", mk_full, x0)
    print(f"\nprep {((tB-tA))*1e3:.3f} | post+K {(tK-tB)*1e3:.3f} | "
          f"kernel {(tC-tK)*1e3:.3f} | "
          f"solve+backsub+mcc {(tD-tC)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
