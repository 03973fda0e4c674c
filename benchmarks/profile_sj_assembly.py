"""Isolated SCHUR_JACOBI windowed assembly kernel timing (Venice shape).

Times K-iteration fori_loops over pallas_kernels.sj_assembly_windowed
(paired-difference marginal). Big operands are passed as jit ARGUMENTS
(closure baking hits the remote-compile payload cap).

Usage: PYTHONPATH=/root/repo python benchmarks/profile_sj_assembly.py [bal16|venice]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import ceres_tpu as ct  # noqa: E402
from ceres_tpu.models import bal  # noqa: E402
from ceres_tpu.ops import bsr, flatops as fo, partition as pt_mod  # noqa: E402
from ceres_tpu.ops import pallas_kernels as pk  # noqa: E402
from ceres_tpu.program import CompiledProgram  # noqa: E402
from ceres_tpu.utils import ordering as om  # noqa: E402


def marginal(make_fn, args, lo=2, hi=6):
    times = {}
    for K in (lo, hi):
        fn = jax.jit(make_fn(K), static_argnums=())
        s = float(fn(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "venice"
    if shape == "venice":
        b = bal.synthetic_bal_large(num_cameras=13696, num_points=1_000_000,
                                    mean_track=4.4, cam_window=60, seed=0)
    else:
        n_cams, n_pts, target_obs = 16, 22106, 83718
        vis = target_obs / (n_cams * n_pts)
        b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                              visibility=vis, noise=1.0, seed=0)
    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem, compute_dtype="float32")
    meta = bsr.build_meta(prog)
    pm = pt_mod.build_partition(meta, om.eligible_e_sets(prog))
    fl = fo.FlatSchurOps(pm)
    x = prog.initial_state()
    o = prog._eval_core(x, True, False, need_grad=False)
    vflat = tuple(tuple(r) for r in fl.flatten(o["block_jacs"]))
    qual = fl._kernel_slots(fl.plans_e, fl.plans_f, fl.pm.e_fams, fl.pm.f_fams)
    assert qual is not None
    pe, pf, windows = qual
    se = jnp.ones((pm.e_size,), jnp.float32)
    sf = jnp.ones((pm.f_size,), jnp.float32)
    JT, ids_T, r, max_rows = fl._kernel_scaled_rows(vflat, pe, pf, se, sf)
    tf, te = pf.t, pe.t
    P, C = pe.nv, pf.nv
    BT = pk.BLOCKS_PER_TILE
    num_tiles = len(pe.rplan[1]) - 1
    print(f"device={jax.devices()[0].device_kind} B={o['residuals'].shape[0]//r}"
          f" C={C} P={P} tiles={num_tiles} max_rows={max_rows}"
          f" n_win={windows[2] if windows else None}"
          f" win_width={windows[1] if windows else None}", flush=True)

    ete = fl.block_ete(vflat)
    minv_e = fo._FlatOpsBase.scaled_block_inverses(
        pm.e_fams, list(ete), se, jnp.ones((pm.e_size,), jnp.float32))
    minv_flat = minv_e[0]
    pw0 = jnp.zeros((P + 1 + BT, 128), jnp.float32)
    pw0 = jax.lax.dynamic_update_slice(pw0, jnp.ones((P, te), jnp.float32),
                                       (0, 0))
    pw0 = jax.lax.dynamic_update_slice(pw0, minv_flat, (0, 8))
    tile_starts = jnp.asarray(pe.rplan[0], jnp.int32)
    tile_block0 = jnp.asarray(pe.rplan[1], jnp.int32)

    for unroll in (2, 8, 16):
        def mk(K, unroll=unroll):
            def f(JT, ids_T, pw):
                def body(_, carry):
                    pwx = pw + carry * 1e-30
                    flat = pk.sj_assembly_windowed(
                        JT, ids_T, pwx, tile_starts, tile_block0, windows,
                        P, C, r, tf, te, max_rows=max_rows, unroll=unroll)
                    return flat[0, 0]
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))
            return f
        per = marginal(mk, (JT, ids_T, pw0))
        print(f"sj_assembly_windowed unroll={unroll:2d}  "
              f"{per*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
