"""Round-5 spmv optimization harness: times the fused S·z kernel on the
BAL-16 shape with the EXACT bench.py protocol (streamed masks, unroll 8,
8-vs-104 fori_loop paired differencing) so kernel changes are judged on
the committed metric. Also reports the moved-bytes bandwidth fraction.

Usage: python benchmarks/profile_spmv_opt.py [unroll ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ceres_tpu.models import bal  # noqa: E402
from ceres_tpu.ops import pallas_kernels as pk  # noqa: E402


def _sync(x):
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def _paired_diff(iters, f_lo, f_hi, repeats=5):
    ds = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        f_lo()
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        f_hi()
        t_hi = time.perf_counter() - t0
        ds.append(t_hi - t_lo)
    ds.sort()
    med = ds[len(ds) // 2]
    if med <= 0:
        return None
    return iters / med


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [8]
    n_cams, n_pts, target_obs = 16, 22106, 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)

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
    T = len(tb) - 1
    print(f"device={jax.devices()[0].device_kind} B={B} T={T} "
          f"max_rows={max_rows} mask_dtype={masks.dtype}", flush=True)

    # correctness reference (host, f64)
    Jf64 = np.asarray(Jf, np.float64)
    Je64 = np.asarray(Je, np.float64)
    z64 = np.asarray(z, np.float64).reshape(C, tf)
    fz = (Jf64.reshape(B, r, tf) * z64[cam][:, None, :]).sum(-1)  # (B, r)
    etfz = np.zeros((P, te))
    np.add.at(etfz, pt, (Je64.reshape(B, r, te) * fz[:, :, None]).sum(1))
    u = np.einsum("pij,pj->pi",
                  np.asarray(minv, np.float64).reshape(P, te, te), etfz)
    q = fz - (Je64.reshape(B, r, te) * u[pt][:, None, :]).sum(-1)
    ref = np.zeros((C, tf))
    np.add.at(ref, cam, (Jf64.reshape(B, r, tf) * q[:, :, None]).sum(1))
    ref = ref.reshape(-1)

    for unroll in unrolls:
        for label, mk in (("streamed", masks), ("inkernel", None)):
            got, ugot = jax.jit(functools.partial(
                pk.isc_matvec, num_points=P, C=C, r=r, tf=tf, te=te,
                max_rows=max_rows, emit_u=True, unroll=unroll))(
                JT, ids_T, z, minv, tsj, tbj, masks_T=mk)
            err = float(np.abs(np.asarray(got, np.float64) - ref).max()
                        / (np.abs(ref).max() + 1e-30))
            uerr = float(np.abs(np.asarray(ugot, np.float64)
                                - u).max() / (np.abs(u).max() + 1e-30))

            def k_mv(JT, ids_T, z, minv, masks, k, unroll=unroll, mk=mk):
                def body(i, zz):
                    cam_o, _ = pk.isc_matvec(
                        JT, ids_T, zz, minv, tsj, tbj, P, C,
                        r, tf, te, max_rows=max_rows,
                        emit_u=False,
                        masks_T=masks if mk is not None else None,
                        unroll=unroll)
                    return zz + 1e-6 * cam_o
                return jax.lax.fori_loop(0, k, body, z)

            f2 = jax.jit(functools.partial(k_mv, k=8))
            f6 = jax.jit(functools.partial(k_mv, k=104))
            _sync(f2(JT, ids_T, z, minv, masks))
            _sync(f6(JT, ids_T, z, minv, masks))
            rate = _paired_diff(
                96.0, lambda: _sync(f2(JT, ids_T, z, minv, masks)),
                lambda: _sync(f6(JT, ids_T, z, minv, masks)))
            per = 1.0 / rate if rate else float("nan")
            bytes_mv = ((JT.size + ids_T.size) * 4
                        + (masks.size * masks.dtype.itemsize
                           if mk is not None else 0)
                        + T * pk.BLOCKS_PER_TILE * 128 * 4)
            nnz = B * r * (tf + te)
            print(f"unroll={unroll:2d} {label:9s} {per*1e6:8.1f} us/matvec "
                  f"{2*nnz/per/1e9:7.2f} Gnnz/s  "
                  f"moved {bytes_mv/per/1e9:6.1f} GB/s "
                  f"({bytes_mv/1e6:.1f} MB)  err={err:.2e} uerr={uerr:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
