"""Isolated S·z matvec: fused Pallas kernel vs flat-ops XLA chain.

Times K-iteration fori_loops over the matvec (marginal method), on the
BAL-16 shape built through the generic program stack.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import ceres_tpu as ct  # noqa: E402
from ceres_tpu.models import bal  # noqa: E402
from ceres_tpu.ops import bsr, flatops as fo, partition as pt_mod  # noqa: E402
from ceres_tpu.program import CompiledProgram  # noqa: E402
from ceres_tpu.utils import ordering as om  # noqa: E402


def marginal(make_fn, x):
    times = {}
    for K in (10, 30):
        fn = jax.jit(make_fn(K))
        s = float(fn(x))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s = float(fn(x))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[30] - times[10]) / 20


def main():
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
    r = o["residuals"]
    print(f"device={jax.devices()[0].device_kind}  B={r.shape[0]//2}  "
          f"f_size={pm.f_size} e_size={pm.e_size}")

    se = jnp.ones((pm.e_size,), jnp.float32)
    sf = jnp.ones((pm.f_size,), jnp.float32)
    d2e = jnp.ones((pm.e_size,), jnp.float32)
    d2f = jnp.ones((pm.f_size,), jnp.float32)
    ete = fl.block_ete(vflat)
    minv_e = fo._FlatOpsBase.scaled_block_inverses(
        pm.e_fams, list(ete), se, d2e)
    z0 = jnp.ones((pm.f_size,), jnp.float32)

    def mk_chain(K):
        def f(z):
            def body(_, zz):
                fz = fl.right_f(vflat, sf * zz)
                etfz = se * fl.left_e(vflat, fz)
                mi = fo._FlatOpsBase.apply_inverse_rows(
                    pm.e_fams, minv_e, etfz)
                e_part = fl.right_e(vflat, se * mi)
                out = sf * fl.left_f(vflat, fz - e_part) + d2f * zz
                return out / jnp.max(jnp.abs(out))
            return jnp.sum(jax.lax.fori_loop(0, K, body, z))
        return f

    per = marginal(mk_chain, z0)
    print(f"flat-ops chain   {per*1e3:8.3f} ms/matvec")

    kern = fl.make_kernel_matvec(vflat, se, sf)
    if kern is None:
        print("kernel matvec: structure does not qualify")
        return
    minv0 = minv_e[0]

    def mk_kern(K):
        def f(z):
            def body(_, zz):
                cam, _ = kern(zz, minv0)
                out = cam + d2f * zz
                return out / jnp.max(jnp.abs(out))
            return jnp.sum(jax.lax.fori_loop(0, K, body, z))
        return f

    per_k = marginal(mk_kern, z0)
    print(f"fused kernel     {per_k*1e3:8.3f} ms/matvec")

    # agreement check
    c1 = mk_chain(3)(z0)
    c2 = mk_kern(3)(z0)
    print(f"agreement: chain {float(c1):.6f} kernel {float(c2):.6f}")


if __name__ == "__main__":
    main()
