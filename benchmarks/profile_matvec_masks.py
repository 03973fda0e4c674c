"""Venice S·z matvec: streamed int8 mask planes vs in-kernel mask builds,
across unroll. Big operands passed as jit args (payload cap).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/profile_matvec_masks.py
"""
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


def marginal(make_fn, args, lo=4, hi=20):
    times = {}
    for K in (lo, hi):
        fn = jax.jit(make_fn(K))
        s = float(fn(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main():
    b = bal.synthetic_bal_large(num_cameras=13696, num_points=1_000_000,
                                mean_track=4.4, cam_window=60, seed=0)
    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem, compute_dtype="float32")
    meta = bsr.build_meta(prog)
    pm = pt_mod.build_partition(meta, om.eligible_e_sets(prog))
    fl = fo.FlatSchurOps(pm)
    x = prog.initial_state()
    o = prog._eval_core(x, True, False, need_grad=False)
    vflat = tuple(tuple(r) for r in fl.flatten(o["block_jacs"]))
    qual = fl._kernel_slots(fl.plans_e, fl.plans_f, fl.pm.e_fams, fl.pm.f_fams)
    pe, pf, windows = qual
    se = jnp.ones((pm.e_size,), jnp.float32)
    sf = jnp.ones((pm.f_size,), jnp.float32)
    JT, ids_T, r, max_rows = fl._kernel_scaled_rows(vflat, pe, pf, se, sf)
    tf, te = pf.t, pe.t
    P, C = pe.nv, pf.nv
    print(f"device={jax.devices()[0].device_kind} C={C} P={P} "
          f"tiles={len(pe.rplan[1])-1}", flush=True)
    ete = fl.block_ete(vflat)
    minv_e = fo._FlatOpsBase.scaled_block_inverses(
        pm.e_fams, list(ete), se, jnp.ones((pm.e_size,), jnp.float32))
    minv_flat = minv_e[0]
    masks = fl.kernel_masks()
    z0 = jnp.ones((pm.f_size,), jnp.float32)
    tile_starts = jnp.asarray(pe.rplan[0], jnp.int32)
    tile_block0 = jnp.asarray(pe.rplan[1], jnp.int32)

    mtab = jax.jit(lambda m: pk.build_minv_tile_table(
        m, pe.rplan[1], te))(minv_flat)
    for label, use_masks, use_tab in (
            ("streamed", True, False), ("in-kernel", False, False),
            ("tiled+strm", True, True), ("tiled", False, True)):
        for unroll in (8, 16):
            def mk(K, use_masks=use_masks, unroll=unroll, use_tab=use_tab):
                def f(JT, ids_T, z, minv, masks_T, mtab):
                    def body(_, zz):
                        cam, _ = pk.isc_matvec(
                            JT, ids_T, zz, minv, tile_starts, tile_block0,
                            P, C, r, tf, te, max_rows=max_rows,
                            windows=windows,
                            masks_T=masks_T if use_masks else None,
                            minv_tiled=mtab if use_tab else None,
                            emit_u=False,
                            unroll=unroll)
                        return cam / jnp.max(jnp.abs(cam))
                    out = jax.lax.fori_loop(0, K, body, z)
                    return jnp.sum(out)
                return f
            per = marginal(mk, (JT, ids_T, z0, minv_flat, masks, mtab))
            print(f"isc_matvec {label:10s} unroll={unroll:2d} "
                  f"{per*1e3:8.2f} ms/matvec "
                  f"({per/4397236*1e9:.2f} ns/obs)", flush=True)


if __name__ == "__main__":
    main()
