"""Block-sparse SpMV benchmark across layouts and backends.

Equivalent of /root/reference/internal/ceres/spmv_benchmark.cc: J v and
J^T u over BAL-shaped block Jacobians, comparing XLA scatter/gather,
sorted segment-sum, and the Pallas one-hot kernels.
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=22106)
    ap.add_argument("--visibility", type=float, default=0.2366)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ceres_tpu.models import bal
    from ceres_tpu.ops import pallas_kernels as pk

    def timeit(fn, *a, n=50):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    b = bal.synthetic_bal(num_cameras=args.num_cameras,
                          num_points=args.num_points,
                          visibility=args.visibility, noise=1.0, seed=0)
    N = b.num_observations
    nnz = N * 2 * 3
    print(f"# obs={N}, point-block nnz={nnz}")
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    Jp = jnp.asarray(rng.standard_normal((N, 2, 3)), f32)
    u = jnp.asarray(rng.standard_normal((N, 2)), f32)
    pt_idx = jnp.asarray(b.point_index)
    P = b.num_points

    f_scatter = jax.jit(
        lambda J, u: jnp.zeros((P, 3), f32)
        .at[pt_idx]
        .add(jnp.einsum("nrt,nr->nt", J, u))
    )
    t = timeit(f_scatter, Jp, u)
    print(f"jt_u scatter          {t*1e3:8.3f} ms  {nnz/t/1e9:6.2f} Gnnz/s")

    op = np.argsort(b.point_index, kind="stable")
    sp = jnp.asarray(b.point_index[op])
    perm = jnp.asarray(op)
    f_seg = jax.jit(
        lambda J, u: jax.ops.segment_sum(
            jnp.take(jnp.einsum("nrt,nr->nt", J, u), perm, axis=0),
            sp,
            num_segments=P,
            indices_are_sorted=True,
        )
    )
    t = timeit(f_seg, Jp, u)
    print(f"jt_u sorted segsum    {t*1e3:8.3f} ms  {nnz/t/1e9:6.2f} Gnnz/s")

    ids_sorted = b.point_index[op].astype(np.int32)
    ts, mr = pk.plan_block_tiles(ids_sorted, P)
    Jp_s = jnp.take(Jp, perm, axis=0)
    u_s = jnp.take(u, perm, axis=0)
    sids = jnp.asarray(ids_sorted)
    tsj = jnp.asarray(ts)
    f_pal = jax.jit(
        lambda J, u: pk.jt_u_sorted(J, u, sids, tsj, P, max_rows=mr)
    )
    t = timeit(f_pal, Jp_s, u_s)
    print(f"jt_u pallas one-hot   {t*1e3:8.3f} ms  {nnz/t/1e9:6.2f} Gnnz/s")

    # gather direction
    vp = jnp.asarray(rng.standard_normal((P, 3)), f32)
    f_take = jax.jit(lambda v: jnp.take(v, pt_idx, axis=0))
    t = timeit(f_take, vp)
    print(f"expand xla take       {t*1e3:8.3f} ms")
    f_exp = jax.jit(
        lambda v: pk.segment_block_expand(v, sids, tsj, N, max_rows=mr)
    )
    t = timeit(f_exp, vp)
    print(f"expand pallas         {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
