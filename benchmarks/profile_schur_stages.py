"""Stage-level timing of the specialized exact-Schur LM step on TPU.

Times each stage of parallel/sharded_ba.lm_step_schur_next with the
k-iterations-inside-one-jit trick (axon dispatch is ~4.6 ms, so every
measurement loops K times inside the jit with a data dependency chained
through iterations).

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


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best / K * 1e3:8.3f} ms/iter")
    return out


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
    print(f"B={B} C={C} P={P}")

    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=dtype)
    reduce_p, expand_p, spread_p = sb._point_ops(pt_idx, P, plan)

    # --- full step (reference point) ---
    @jax.jit
    def full(c0, p0, r0):
        carry = sb.lm_step_schur_init(c0, p0, cam_idx, pt_idx, obs, r0,
                                      None, plan)
        def body(_, cr):
            return sb.lm_step_schur_next(cr, cam_idx, pt_idx, obs, None, plan)
        out = jax.lax.fori_loop(0, K, body, carry)
        return out.cams, out.pts, out.cost

    timed("full lm_step_schur", full, cams, pts, jnp.asarray(1e4, dtype))

    # --- eval only ---
    @jax.jit
    def eval_only(c0, p0):
        def body(i, acc):
            c = c0 + acc[0, :1] * 1e-30
            r, J = sb._evaluate_flat(c, p0, cam_idx, obs, None, oh_gather,
                                     expand_p)
            return acc + jnp.concatenate([r, J], axis=1)[:9, :9]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((9, 9), dtype))

    timed("eval (r + flat J)", eval_only, cams, pts)

    # --- eval: residual only (no jacfwd) ---
    @jax.jit
    def eval_r(c0, p0):
        def body(i, acc):
            c = c0 + acc[:1, :1] * 1e-30
            r = jax.vmap(sb.snavely_reprojection_residual)(
                sb._gather_cams(c, cam_idx, oh_gather), expand_p(p0), obs
            )
            return acc + r[:9, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((9, 2), dtype))

    timed("eval (residual only)", eval_r, cams, pts)

    # --- schur core from fixed (r, J) ---
    r0, J0 = jax.jit(functools.partial(
        sb._evaluate_flat, w=None, oh_gather=oh_gather, expand_p=expand_p
    ))(cams, pts, cam_idx, obs)
    jax.block_until_ready((r0, J0))

    @jax.jit
    def core(J, r, radius):
        def body(i, acc):
            Jx = J + acc[0, 0] * 1e-30
            sc_, sp_, *_ = sb._schur_core(
                Jx, r, radius, cam_idx, oh_gather, oh_gather, reduce_p,
                expand_p, C, P, spread_p=spread_p)
            return acc + sc_[:2, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2), dtype))

    timed("schur core (all)", core, J0, r0, jnp.asarray(1e4, dtype))

    # --- stage: fused point reduction (jtr/jsq/outer + reduce_p + reduce_c)
    R, S_sel = sb._flat_selectors(2, 9, 3, dtype)

    @jax.jit
    def stage_reduce(J, r):
        def body(i, acc):
            Jx = J + acc[0, 0] * 1e-30
            jtr = sb._mmf(Jx * sb._mmf(r, S_sel.T), R.T)
            jsq = sb._mmf(Jx * Jx, R.T)
            J_p_u = Jx[:, 18:]
            jptjp = sb._outer_flat(J_p_u, J_p_u,
                                   sb._outer_selectors(2, 3, 3, dtype))
            red = reduce_p(jnp.concatenate([jtr[:, 9:], jsq[:, 9:], jptjp],
                                           axis=1))
            gc = jnp.einsum("bk,bc->ck", jtr[:, :9], oh_gather,
                            precision=sb._HI)
            return acc + red[:2, :2] + gc[:2, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2), dtype))

    timed("stage: fused point reduce", stage_reduce, J0, r0)

    # --- stage: point expand (Kf, sp) ---
    Kf0 = jnp.ones((P, 9), dtype)
    sp0 = jnp.ones((P, 3), dtype)

    @jax.jit
    def stage_expand(Kf, sp):
        def body(i, acc):
            Kx = Kf + acc[0, 0] * 1e-30
            exp = expand_p(jnp.concatenate([Kx, sp], axis=1))
            return acc + exp[:2, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2), dtype))

    timed("stage: point expand (P->B,12)", stage_expand, Kf0, sp0)

    # --- stage: W/Y selector algebra (B-wide matmuls) ---
    @jax.jit
    def stage_wy(J):
        GA, GB, G3 = sb._matmul_selectors(3, 3, 9, dtype)
        Kf_g = jnp.ones((B, 9), dtype)

        def body(i, acc):
            Jx = J + acc[0, 0] * 1e-30
            Js_c = Jx[:, :18]
            Js_p = Jx[:, 18:]
            W = sb._outer_flat(Js_p, Js_c,
                               sb._outer_selectors(2, 3, 9, dtype))
            Y = sb._mmf(sb._mmf(Kf_g, GA) * sb._mmf(W, GB), G3)
            return acc + Y[:2, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2), dtype))

    timed("stage: W/Y algebra", stage_wy, J0)

    # --- stage: A spread (Mosaic) ---
    Y0 = jnp.ones((B, 27), dtype)

    @jax.jit
    def stage_spread(Y):
        def body(i, acc):
            Yx = Y + acc[0, 0] * 1e-30
            A = spread_p(Yx, cam_idx, C, 3, 9)
            return acc + A[:2, :2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2), dtype))

    timed("stage: A spread (Mosaic)", stage_spread, Y0)

    # --- stage: F'F + S assembly + solve ---
    A0 = jnp.ones((P * 3, C * 9), dtype)

    @jax.jit
    def stage_solve(J, A):
        def body(i, acc):
            Jx = J + acc[0, 0] * 1e-30
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
            return acc + z[:2]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((2,), dtype))

    timed("stage: S assemble + solve", stage_solve, J0, A0)

    # --- stage: candidate eval (residual only, after step) ---
    timed("stage: cand eval == resid", eval_r, cams, pts)


if __name__ == "__main__":
    main()
