"""Marginal (K40-K20) per-iteration cost of the specialized Schur LM step
and its stages — the trustworthy version of profile_schur_stages."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ceres_tpu.models import bal
from ceres_tpu.ops import pallas_kernels as pk
from ceres_tpu.parallel import sharded_ba as sb


def bench(name, make_fn, *args):
    times = {}
    for K in (20, 40):
        fn = jax.jit(make_fn(K))
        s = float(fn(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            s = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[40] - times[20]) / 20
    print(f"{name:40s} {per * 1e3:8.3f} ms/iter   (K20 {times[20]*1e3:7.2f})")


def main():
    dtype = jnp.float32
    n_cams, n_pts = 16, 22106
    target_obs = 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    order = np.argsort(np.asarray(b.point_index), kind="stable")
    cams = jnp.asarray(b.cameras, dtype)
    pts = jnp.asarray(b.points, dtype)
    cam_idx = jnp.asarray(np.asarray(b.camera_index)[order])
    pt_idx = jnp.asarray(np.asarray(b.point_index)[order])
    obs = jnp.asarray(np.asarray(b.observations)[order], dtype)
    plan = pk.plan_block_tiles(np.asarray(pt_idx), n_pts)
    C, P = n_cams, n_pts
    B = int(cam_idx.shape[0])
    print(f"B={B} C={C} P={P} plan_max_rows={plan[1]}")

    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=dtype)
    reduce_p, expand_p, spread_p = sb._point_ops(pt_idx, P, plan)

    # full step
    def mk_full(K):
        def f(c0, p0, r0):
            carry = sb.lm_step_schur_init(c0, p0, cam_idx, pt_idx, obs, r0,
                                          None, plan)
            def body(_, cr):
                return sb.lm_step_schur_next(cr, cam_idx, pt_idx, obs, None,
                                             plan)
            out = jax.lax.fori_loop(0, K, body, carry)
            return out.cost
        return f

    bench("full lm_step_schur", mk_full, cams, pts, jnp.asarray(1e4, dtype))

    # eval (r + flat J)
    def mk_eval(K):
        def f(c0, p0):
            def body(i, acc):
                c = c0 * (1.0 + 1e-14 * jnp.float32(i))
                r, J = sb._evaluate_flat(c, p0, cam_idx, obs, None, oh_gather,
                                         expand_p)
                return acc + r[0, 0] + J[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("eval (r + flat J)", mk_eval, cams, pts)

    # residual only
    def mk_resid(K):
        def f(c0, p0):
            def body(i, acc):
                c = c0 * (1.0 + 1e-14 * jnp.float32(i))
                r = jax.vmap(sb.snavely_reprojection_residual)(
                    sb._gather_cams(c, cam_idx, oh_gather), expand_p(p0), obs)
                return acc + r[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("eval (residual only)", mk_resid, cams, pts)

    r0, J0 = jax.jit(functools.partial(
        sb._evaluate_flat, w=None, oh_gather=oh_gather, expand_p=expand_p
    ))(cams, pts, cam_idx, obs)
    jax.block_until_ready((r0, J0))

    # schur core
    def mk_core(K):
        def f(J, r, radius):
            def body(i, acc):
                Jx = J * (1.0 + 1e-14 * jnp.float32(i))
                sc_, sp_, *_ = sb._schur_core(
                    Jx, r, radius, cam_idx, oh_gather, oh_gather, reduce_p,
                    expand_p, C, P, spread_p=spread_p)
                return acc + sc_[0, 0] + sp_[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("schur core (all)", mk_core, J0, r0, jnp.asarray(1e4, dtype))

    R, S_sel = sb._flat_selectors(2, 9, 3, dtype)

    # fused point reduce stage
    def mk_red(K):
        def f(J, r):
            def body(i, acc):
                Jx = J * (1.0 + 1e-14 * jnp.float32(i))
                jtr = sb._mmf(Jx * sb._mmf(r, S_sel.T), R.T)
                jsq = sb._mmf(Jx * Jx, R.T)
                J_p_u = Jx[:, 18:]
                jptjp = sb._outer_flat(J_p_u, J_p_u,
                                       sb._outer_selectors(2, 3, 3, dtype))
                red = reduce_p(jnp.concatenate(
                    [jtr[:, 9:], jsq[:, 9:], jptjp], axis=1))
                gc = jnp.einsum("bk,bc->ck", jtr[:, :9], oh_gather,
                                precision=sb._HI)
                return acc + red[0, 0] + gc[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: fused point reduce", mk_red, J0, r0)

    # point expand stage
    Kf0 = jnp.ones((P, 9), dtype)
    sp0 = jnp.ones((P, 3), dtype)

    def mk_exp(K):
        def f(Kf, sp):
            def body(i, acc):
                Kx = Kf * (1.0 + 1e-14 * jnp.float32(i))
                exp = expand_p(jnp.concatenate([Kx, sp], axis=1))
                return acc + exp[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: point expand (P->B,12)", mk_exp, Kf0, sp0)

    # W/Y algebra stage
    def mk_wy(K):
        GA, GB, G3 = sb._matmul_selectors(3, 3, 9, dtype)
        Kf_g = jnp.ones((B, 9), dtype)

        def f(J):
            def body(i, acc):
                Jx = J * (1.0 + 1e-14 * jnp.float32(i))
                Js_c = Jx[:, :18]
                Js_p = Jx[:, 18:]
                W = sb._outer_flat(Js_p, Js_c,
                                   sb._outer_selectors(2, 3, 9, dtype))
                Y = sb._mmf(sb._mmf(Kf_g, GA) * sb._mmf(W, GB), G3)
                return acc + Y[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: W/Y algebra", mk_wy, J0)

    # A spread stage
    Y0 = jnp.ones((B, 27), dtype)

    def mk_spread(K):
        def f(Y):
            def body(i, acc):
                Yx = Y * (1.0 + 1e-14 * jnp.float32(i))
                A = spread_p(Yx, cam_idx, C, 3, 9)
                return acc + A[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: A spread (Mosaic)", mk_spread, Y0)

    # S assemble + solve stage
    A0 = jnp.ones((P * 3, C * 9), dtype)

    def mk_solve(K):
        def f(J, A):
            def body(i, acc):
                Jx = J * (1.0 + 1e-14 * jnp.float32(i))
                Js_c = Jx[:, :18]
                jctjc = sb._outer_flat(Js_c, Js_c,
                                       sb._outer_selectors(2, 9, 9, dtype))
                FtF = jnp.einsum("bk,bc->ck", jctjc, oh_gather,
                                 precision=sb._HI).reshape(C, 9, 9)
                S = jnp.einsum("cij,cd->cidj", FtF,
                               jnp.eye(C, dtype=dtype)).reshape(C * 9, C * 9)
                S = S - jnp.einsum("kf,kg->fg", A, A, precision=sb._HI)
                S = S + jnp.eye(C * 9, dtype=dtype)
                Ls = jnp.linalg.cholesky(S)
                z = jax.scipy.linalg.cho_solve((Ls, True),
                                               jnp.ones((C * 9,), dtype))
                return acc + z[0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: S assemble + solve", mk_solve, J0, A0)

    # point solves (f64 lanes) stage
    M0 = jnp.tile(jnp.asarray([4., 1., 0., 1., 5., 1., 0., 1., 6.], dtype),
                  (P, 1))

    def mk_psolve(K):
        def f(M):
            def body(i, acc):
                Mx = M * (1.0 + 1e-14 * jnp.float32(i))
                L3 = sb._chol3_flat(Mx.astype(jnp.float64))
                Kf = sb._inv_lower3(L3).astype(dtype)
                return acc + Kf[0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    bench("stage: f64 point chol+inv", mk_psolve, M0)


if __name__ == "__main__":
    main()
