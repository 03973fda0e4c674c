"""Stage-level timing of the specialized exact-Schur LM step on TPU.

Marginal cost between K and 2K in-jit iterations: the tunnel's per-call
overhead varies 0.1-25 ms between sessions, so single-call/K numbers are
meaningless — always difference two loop lengths.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_schur_stages.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ceres_tpu.models import bal
from ceres_tpu.ops import pallas_kernels as pk
from ceres_tpu.parallel import sharded_ba as sb

K = 20


def timed(name, make_fn, *args):
    times = {}
    for mult in (1, 2):
        fn = jax.jit(make_fn(K * mult))
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[mult] = best
    per = (times[2] - times[1]) / K
    print(f"{name:34s} {per * 1e3:8.3f} ms/iter  "
          f"(K {times[1]*1e3:.1f} ms, 2K {times[2]*1e3:.1f} ms)")


def main():
    dtype = jnp.float32
    n_cams, n_pts = 16, 22106
    target_obs = 83718
    vis = target_obs / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    new_id = pk.balanced_block_order(np.asarray(b.point_index), n_pts)
    pt_new = new_id[np.asarray(b.point_index)]
    order = np.argsort(pt_new, kind="stable")
    cams = jnp.asarray(b.cameras, dtype)
    pts = jnp.asarray(np.asarray(b.points)[np.argsort(new_id)], dtype)
    cam_idx = jnp.asarray(np.asarray(b.camera_index)[order])
    pt_idx = jnp.asarray(pt_new[order])
    obs = jnp.asarray(np.asarray(b.observations)[order], dtype)
    plan = pk.plan_block_tiles(np.asarray(pt_idx), n_pts)
    C, P = n_cams, n_pts
    B = int(cam_idx.shape[0])
    print(f"B={B} C={C} P={P} max_rows={plan[1]}")

    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=dtype)
    reduce_p, expand_p, spread_p = sb._point_ops(pt_idx, P, plan)

    def mk_full(KK):
        def full(c0, p0, r0):
            carry = sb.lm_step_schur_init(c0, p0, cam_idx, pt_idx, obs, r0,
                                          None, plan)

            def body(_, cr):
                return sb.lm_step_schur_next(cr, cam_idx, pt_idx, obs, None,
                                             plan)

            out = jax.lax.fori_loop(0, KK, body, carry)
            return out.cams, out.pts, out.cost
        return full

    timed("full lm_step_schur", mk_full, cams, pts, jnp.asarray(1e4, dtype))

    def mk_eval(KK):
        def f(c0, p0):
            def body(i, acc):
                c = c0 + acc[0, :1] * 1e-30
                r, J = sb._evaluate_flat(c, p0, cam_idx, obs, None,
                                         oh_gather, expand_p)
                return acc + jnp.concatenate([r, J], axis=1)[:9, :9]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((9, 9), dtype))
        return f

    timed("eval (r + flat J)", mk_eval, cams, pts)

    def mk_eval_r(KK):
        def f(c0, p0):
            def body(i, acc):
                c = c0 + acc[:1, :1] * 1e-30
                r = jax.vmap(sb.snavely_reprojection_residual)(
                    sb._gather_cams(c, cam_idx, oh_gather), expand_p(p0), obs
                )
                return acc + r[:9, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((9, 2), dtype))
        return f

    timed("eval (residual only)", mk_eval_r, cams, pts)

    r0, J0 = jax.jit(functools.partial(
        sb._evaluate_flat, w=None, oh_gather=oh_gather, expand_p=expand_p
    ))(cams, pts, cam_idx, obs)
    jax.block_until_ready((r0, J0))

    def mk_core(KK):
        def f(J, r, radius):
            def body(i, acc):
                Jx = J + acc[0, 0] * 1e-30
                sc_, sp_, *_ = sb._schur_core(
                    Jx, r, radius, cam_idx, oh_gather, oh_gather, reduce_p,
                    expand_p, C, P, spread_p=spread_p)
                return acc + sc_[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("schur core (all)", mk_core, J0, r0, jnp.asarray(1e4, dtype))

    R, S_sel = sb._flat_selectors(2, 9, 3, dtype)

    def mk_reduce(KK):
        def f(J, r):
            def body(i, acc):
                Jx = J + acc[0, 0] * 1e-30
                jtr = sb._mmf(Jx * sb._mmf(r, S_sel.T), R.T)
                jsq = sb._mmf(Jx * Jx, R.T)
                J_p_u = Jx[:, 18:]
                jptjp = sb._outer_flat(J_p_u, J_p_u,
                                       sb._outer_selectors(2, 3, 3, dtype))
                red = reduce_p(jnp.concatenate(
                    [jtr[:, 9:], jsq[:, 9:], jptjp], axis=1))
                gc = jnp.einsum("bk,bc->ck", jtr[:, :9], oh_gather,
                                precision=sb._HI)
                return acc + red[:2, :2] + gc[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: fused point reduce", mk_reduce, J0, r0)

    Kf0 = jnp.ones((P, 9), dtype)
    sp0 = jnp.ones((P, 3), dtype)

    def mk_expand(KK):
        def f(Kf, sp):
            def body(i, acc):
                Kx = Kf + acc[0, 0] * 1e-30
                exp = expand_p(jnp.concatenate([Kx, sp], axis=1))
                return acc + exp[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: point expand (P->B,12)", mk_expand, Kf0, sp0)

    def mk_wy(KK):
        GA, GB, G3 = sb._matmul_selectors(3, 3, 9, dtype)
        Kf_g = jnp.ones((B, 9), dtype)

        def f(J):
            def body(i, acc):
                Jx = J + acc[0, 0] * 1e-30
                Js_c = Jx[:, :18]
                Js_p = Jx[:, 18:]
                W = sb._outer_flat(Js_p, Js_c,
                                   sb._outer_selectors(2, 3, 9, dtype))
                Y = sb._mmf(sb._mmf(Kf_g, GA) * sb._mmf(W, GB), G3)
                return acc + Y[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: W/Y algebra", mk_wy, J0)

    Y0 = jnp.ones((B, 27), dtype)

    def mk_spread(KK):
        def f(Y):
            def body(i, acc):
                Yx = Y + acc[0, 0] * 1e-30
                A = spread_p(Yx, cam_idx, C, 3, 9)
                return acc + A[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: A spread (Mosaic)", mk_spread, Y0)

    Jc0 = jnp.ones((B, 18), dtype)

    def mk_spread_ftf(KK):
        def f(Y, Jc):
            def body(i, acc):
                Yx = Y + acc[0, 0] * 1e-30
                A, ftf = spread_p(Yx, cam_idx, C, 3, 9, Jc=Jc)
                return acc + A[:2, :2] + ftf[:2, :2]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: A spread + FtF (Mosaic)", mk_spread_ftf, Y0, Jc0)

    # per-point f64 lanes: scaling, M flat, Cholesky, L^{-1}, u
    ete0 = jnp.ones((P, 9), dtype) * 3.0
    gp0 = jnp.ones((P, 3), dtype)
    d2p0 = jnp.ones((P, 3), dtype)

    def mk_pointlanes(KK):
        def f(ete_u, gp, d2p):
            diag_embed = np.zeros((3, 9))
            for i in range(3):
                diag_embed[i, i * 3 + i] = 1.0
            de = jnp.asarray(diag_embed, dtype)

            def body(i, acc):
                ete = ete_u + acc[0, 0] * 1e-30
                sp_ = 1.0 / (1.0 + jnp.sqrt(d2p))
                sp_outer = sb._outer_flat(
                    sp_, sp_, sb._outer_selectors(1, 3, 3, dtype))
                M_flat = ete * sp_outer + sb._mmf(d2p, de)
                dt3 = jnp.float64
                L3 = sb._chol3_flat(M_flat.astype(dt3) + jnp.eye(1, dtype=dt3)[0, 0])
                Kf64 = sb._inv_lower3(L3)
                etb = sp_ * gp
                u = jnp.stack(
                    [sum(Kf64[:, a * 3 + k] * etb[:, k].astype(dt3)
                         for k in range(3)) for a in range(3)], axis=1)
                return acc + Kf64[:2, :2].astype(dtype) + u[:2, :2].astype(dtype)
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 2), dtype))
        return f

    timed("stage: point lanes f64 (M,chol,u)", mk_pointlanes, ete0, gp0, d2p0)

    # S assembly + solve + backsub from fixed A/FtF
    A0 = jnp.ones((P * 3, C * 9), dtype) * 1e-3
    FtF0 = jnp.broadcast_to(jnp.eye(9, dtype=dtype) * 100.0,
                            (C, 9, 9)) + jnp.ones((C, 9, 9), dtype)
    D2c0 = jnp.ones((C, 9), dtype)
    rhs0 = jnp.ones((C * 9,), dtype)

    def mk_solve(KK):
        def f(A, FtF, D2c, ftb):
            def body(i, acc):
                Ax = A + acc[0, 0] * 1e-30
                S = jnp.einsum("cij,cd->cidj", FtF,
                               jnp.eye(C, dtype=dtype)).reshape(C * 9, C * 9)
                S = S - jnp.einsum("kf,kg->fg", Ax, Ax, precision=sb._HI)
                S = S + jnp.diag(D2c.reshape(-1))
                from ceres_tpu.solvers.linear.dense import tri_inverse_lower
                Ls = jnp.linalg.cholesky(S)
                Linv = tri_inverse_lower(Ls)
                z = Linv.T @ (Linv @ ftb)
                Az = jnp.einsum("kf,f->k", Ax, z, precision=sb._HI)
                return acc + z[:2, None] + Az[:2, None]
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((2, 1), dtype))
        return f

    timed("stage: S assembly+solve+backsub", mk_solve, A0, FtF0, D2c0, rhs0)


if __name__ == "__main__":
    main()
