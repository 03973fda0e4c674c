"""Ablation decomposition of the fused S·z kernel on BAL-16 (r5).
Monkeypatches the _ABL_* flags to attribute time to DMA / camera side /
point side. Usage: python benchmarks/profile_spmv_ablate.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ceres_tpu.models import bal  # noqa: E402
from ceres_tpu.ops import pallas_kernels as pk  # noqa: E402


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def _paired(iters, f_lo, f_hi, repeats=5):
    ds = []
    for _ in range(repeats):
        t0 = time.perf_counter(); f_lo(); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); f_hi(); t_hi = time.perf_counter() - t0
        ds.append(t_hi - t_lo)
    ds.sort()
    med = ds[len(ds) // 2]
    return iters / med if med > 0 else None


def main():
    n_cams, n_pts, target_obs = 16, 22106, 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    r, tf, te = 2, 9, 3
    P, C = b.num_points, b.num_cameras
    order = np.argsort(np.asarray(b.point_index), kind="stable")
    pt = np.asarray(b.point_index)[order]
    cam = np.asarray(b.camera_index)[order]
    B = pt.shape[0]
    rng = np.random.default_rng(0)
    Jf = jnp.asarray(rng.standard_normal((B, r * tf)), jnp.float32)
    Je = jnp.asarray(rng.standard_normal((B, r * te)), jnp.float32)
    z = jnp.asarray(rng.standard_normal(C * tf), jnp.float32)
    minv = jnp.asarray(rng.standard_normal((P, te * te)), jnp.float32)
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1)
    tsj, tbj = jnp.asarray(ts), jnp.asarray(tb)
    JT, ids_T = jax.jit(functools.partial(
        pk.prep_matvec_rows, max_rows=max_rows, r=r, tf=tf, te=te))(
        Jf, Je, jnp.asarray(pt), jnp.asarray(cam))
    masks = jax.jit(functools.partial(
        pk.build_matvec_masks, num_points=P, max_rows=max_rows))(
        jnp.asarray(pt), jnp.asarray(cam), tbj)
    _sync(JT)

    def measure(label, masks_T, unroll=8):
        def k_mv(JT, ids_T, z, minv, masks, k):
            def body(i, zz):
                cam_o, _ = pk.isc_matvec(
                    JT, ids_T, zz, minv, tsj, tbj, P, C, r, tf, te,
                    max_rows=max_rows, emit_u=False, masks_T=masks_T,
                    unroll=unroll)
                return zz + 1e-6 * cam_o
            return jax.lax.fori_loop(0, k, body, z)
        f2 = jax.jit(functools.partial(k_mv, k=8))
        f6 = jax.jit(functools.partial(k_mv, k=104))
        _sync(f2(JT, ids_T, z, minv, masks))
        _sync(f6(JT, ids_T, z, minv, masks))
        rate = _paired(96.0,
                       lambda: _sync(f2(JT, ids_T, z, minv, masks)),
                       lambda: _sync(f6(JT, ids_T, z, minv, masks)))
        per = 1e6 / rate if rate else float("nan")
        print(f"{label:28s} {per:8.1f} us/matvec", flush=True)
        return per

    for mode, mk in (("streamed", masks), ("inkernel", None)):
        for flags in ((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 1, 0),
                      (1, 1, 0), (1, 1, 1)):
            pk._ABL_NO_PT, pk._ABL_NO_CAM, pk._ABL_NO_DMA = (
                bool(flags[0]), bool(flags[1]), bool(flags[2]))
            name = f"{mode} pt={1-flags[0]} cam={1-flags[1]} dma={1-flags[2]}"
            measure(name, mk)
    pk._ABL_NO_PT = pk._ABL_NO_CAM = pk._ABL_NO_DMA = False


if __name__ == "__main__":
    main()
