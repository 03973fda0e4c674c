"""Autodiff cost-functor benchmarks.

Equivalent of /root/reference/internal/ceres/autodiff_benchmarks/
(autodiff_benchmarks.cc: functors from trivial linear to rotation-heavy
BA): times batched residual+Jacobian evaluation per functor, the direct
measure of the Jet-replacement (jacfwd+vmap) overhead.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ceres_tpu import rotation as rot
    from ceres_tpu.models.bal import snavely_reprojection_residual

    B = 50000
    rng = np.random.default_rng(0)

    def bench(name, fn, *args):
        def rj(*a):
            r = fn(*a)
            J = jax.jacfwd(fn, argnums=tuple(range(len(a))))(*a)
            return r, J

        f = jax.jit(jax.vmap(rj))
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(*args)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 20
        print(f"{name:28s} {t*1e3:9.3f} ms  {B/t/1e6:8.2f} Mfunctor/s")

    x1 = jnp.asarray(rng.standard_normal((B, 2)))
    bench("linear2 (r = x)", lambda v: v, x1)

    xs = jnp.asarray(rng.standard_normal((B, 10)))
    bench("linear10", lambda v: v, xs)

    data = jnp.asarray(rng.standard_normal((B, 2)))
    bench(
        "curve_fit exp(mx+c)",
        lambda mc, d: d[1:] - jnp.exp(mc[0] * d[0] + mc[1]),
        jnp.asarray(rng.standard_normal((B, 2))),
        data,
    )

    aa = jnp.asarray(rng.standard_normal((B, 3)) * 0.3)
    pt = jnp.asarray(rng.standard_normal((B, 3)))
    bench("rotate_point (angle-axis)", rot.angle_axis_rotate_point, aa, pt)

    cams = jnp.asarray(rng.standard_normal((B, 9)) * 0.1)
    pts = jnp.asarray(rng.standard_normal((B, 3)))
    obs = jnp.asarray(rng.standard_normal((B, 2)))
    bench("snavely_reprojection", snavely_reprojection_residual, cams, pts, obs)

    q = rng.standard_normal((B, 4))
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    bench(
        "relative_pose (quaternion)",
        lambda qa, qb: rot.quaternion_product(rot.quaternion_conjugate(qa), qb),
        q,
        jnp.asarray(np.roll(np.asarray(q), 1, axis=0)),
    )


if __name__ == "__main__":
    main()
