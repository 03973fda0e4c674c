"""ELL-packed bundle-adjustment LM pipeline: the gather-free hot path.

Motivation (measured on TPU v5e, see bench notes): XLA row gathers and
scatter-adds cost ~20ns per ROW regardless of width, so the per-observation
gather/scatter pairs dominate the CG matvec. This pipeline removes them:

 - observations are packed per point into an ELL grid (P, L) (L = max
   track length, zero-mask padding) — every point-side reduction becomes a
   sum over the L axis (a reshape-reduction, no scatter), and point
   parameters broadcast (no gather);
 - camera-side gathers/reductions become one-hot matmuls on the MXU
   (num_cameras is small in the Schur regime);
 - under a mesh, the POINT axis is sharded: point states live on their
   shard (the SURVEY.md §5.7 partition-by-point layout), camera state is
   replicated, and only the small camera-sized reductions cross ICI.

The padding costs (P*L/N)x flops on elementwise work, which is cheap; the
eliminated per-row op cost is not.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.bal import snavely_reprojection_residual
from .sharded_ba import BAState, make_mesh


class ELLProblem(NamedTuple):
    obs: jax.Array  # (P, L, 2)
    cam_onehot: jax.Array  # (P, L, C) f32 one-hot of camera per slot
    mask: jax.Array  # (P, L)
    num_cameras: int


def pack_ell(bal_problem, dtype=jnp.float32, pad_points_to: int = 1) -> ELLProblem:
    cam_idx = np.asarray(bal_problem.camera_index)
    pt_idx = np.asarray(bal_problem.point_index)
    obs = np.asarray(bal_problem.observations)
    Pn = bal_problem.num_points
    C = bal_problem.num_cameras
    counts = np.bincount(pt_idx, minlength=Pn)
    L = int(counts.max())
    Pp = -(-Pn // pad_points_to) * pad_points_to
    grid_obs = np.zeros((Pp, L, 2))
    grid_cam = np.zeros((Pp, L), np.int64)
    grid_mask = np.zeros((Pp, L))
    slot = np.zeros(Pn, np.int64)
    for k in range(len(cam_idx)):
        p = pt_idx[k]
        s = slot[p]
        slot[p] = s + 1
        grid_obs[p, s] = obs[k]
        grid_cam[p, s] = cam_idx[k]
        grid_mask[p, s] = 1.0
    onehot = np.zeros((Pp, L, C), np.float32)
    pp, ll = np.meshgrid(np.arange(Pp), np.arange(L), indexing="ij")
    onehot[pp, ll, grid_cam] = grid_mask  # masked one-hot
    return ELLProblem(
        obs=jnp.asarray(grid_obs, dtype),
        cam_onehot=jnp.asarray(onehot, dtype),
        mask=jnp.asarray(grid_mask, dtype),
        num_cameras=C,
    )


def _eval_ell(cams, pts, ell: ELLProblem):
    """Residuals + Jacobian blocks on the (P, L) grid; no gathers."""
    camg = jnp.einsum("plc,cj->plj", ell.cam_onehot, cams)  # (P, L, 9)
    Pn, L = ell.mask.shape

    def per_obs(cam, pt, ob):
        def f(c, p):
            return snavely_reprojection_residual(c, p, ob)

        r = f(cam, pt)
        Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam, pt)
        return r, Jc, Jp

    ptsb = jnp.broadcast_to(pts[:, None, :], (Pn, L, 3))
    r, Jc, Jp = jax.vmap(jax.vmap(per_obs))(camg, ptsb, ell.obs)
    m = ell.mask
    return r * m[..., None], Jc * m[..., None, None], Jp * m[..., None, None]


def _reduce_cam(ell, contrib):
    """sum per camera: (P, L, k) -> (C, k) via MXU."""
    return jnp.einsum("plc,plk->ck", ell.cam_onehot, contrib)


def _matvec(Jc, Jp, ell, vc, vp, D2c, D2p):
    vcg = jnp.einsum("plc,cj->plj", ell.cam_onehot, vc)
    jv = jnp.einsum("plri,pli->plr", Jc, vcg) + jnp.einsum(
        "plri,pi->plr", Jp, vp
    )
    gc = _reduce_cam(ell, jnp.einsum("plri,plr->pli", Jc, jv))
    gp = jnp.sum(jnp.einsum("plri,plr->pli", Jp, jv), axis=1)
    return gc + D2c * vc, gp + D2p * vp


def lm_step_ell(cams, pts, ell: ELLProblem, radius, cg_iters: int = 10):
    """One LM iteration on the ELL grid (same semantics as
    sharded_ba.lm_step)."""
    r, Jc, Jp = _eval_ell(cams, pts, ell)
    cost = 0.5 * jnp.sum(r * r)

    gc = _reduce_cam(ell, jnp.einsum("plri,plr->pli", Jc, r))
    gp = jnp.sum(jnp.einsum("plri,plr->pli", Jp, r), axis=1)
    d2c = _reduce_cam(ell, jnp.einsum("plri,plri->pli", Jc, Jc))
    d2p = jnp.sum(jnp.einsum("plri,plri->pli", Jp, Jp), axis=1)
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    scg = jnp.einsum("plc,cj->plj", ell.cam_onehot, sc)
    Jc_s = Jc * scg[:, :, None, :]
    Jp_s = Jp * sp[:, None, None, :]
    diag_c = jnp.clip(_reduce_cam(ell, jnp.einsum("plri,plri->pli", Jc_s, Jc_s)), 1e-6, 1e32)
    diag_p = jnp.clip(jnp.sum(jnp.einsum("plri,plri->pli", Jp_s, Jp_s), axis=1), 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius
    rhs_c = _reduce_cam(ell, jnp.einsum("plri,plr->pli", Jc_s, r))
    rhs_p = jnp.sum(jnp.einsum("plri,plr->pli", Jp_s, r), axis=1)

    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = _matvec(Jc_s, Jp_s, ell, pc, pp, D2c, D2p)
        pq = jnp.sum(pc * qc) + jnp.sum(pp * qp)
        alpha = rz / jnp.maximum(pq, 1e-300)
        xc = xc + alpha * pc
        xp = xp + alpha * pp
        rc = rc - alpha * qc
        rp = rp - alpha * qp
        zc = Minv_c * rc
        zp = Minv_p * rp
        rz_new = jnp.sum(rc * zc) + jnp.sum(rp * zp)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        pc = zc + beta * pc
        pp = zp + beta * pp
        return xc, xp, rc, rp, pc, pp, rz_new

    zc0 = Minv_c * rhs_c
    zp0 = Minv_p * rhs_p
    rz0 = jnp.sum(rhs_c * zc0) + jnp.sum(rhs_p * zp0)
    init = (jnp.zeros_like(cams), jnp.zeros_like(pts), rhs_c, rhs_p, zc0, zp0, rz0)
    yc, yp, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    step_c, step_p = -yc, -yp

    vcg = jnp.einsum("plc,cj->plj", ell.cam_onehot, step_c)
    jstep = jnp.einsum("plri,pli->plr", Jc_s, vcg) + jnp.einsum(
        "plri,pi->plr", Jp_s, step_p
    )
    model_cost_change = -jnp.sum(jstep * (r + jstep / 2.0))

    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    r_new, _, _ = _eval_ell(new_cams, new_pts, ell)
    new_cost = 0.5 * jnp.sum(r_new * r_new)
    rel = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = (model_cost_change > 0) & (rel > 1e-3)
    cams_out = jnp.where(accept, new_cams, cams)
    pts_out = jnp.where(accept, new_pts, pts)
    radius_out = jnp.where(
        accept,
        jnp.minimum(radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rel - 1.0) ** 3), 1e16),
        radius / 2.0,
    )
    cost_out = jnp.where(accept, new_cost, cost)
    return BAState(cams_out, pts_out, radius_out, cost_out)


def solve_ba_ell(bal_problem, num_iterations=10, mesh: "Mesh | None" = None,
                 cg_iters=10, dtype=jnp.float32):
    """LM iterations on the ELL pipeline; with a mesh, the point axis is
    sharded (point state lives on its shard; camera reductions psum)."""
    n_dev = mesh.devices.size if mesh is not None else 1
    ell = pack_ell(bal_problem, dtype, pad_points_to=n_dev)
    Pp = ell.mask.shape[0]
    cams = jnp.asarray(bal_problem.cameras, dtype)
    pts = np.zeros((Pp, 3))
    pts[: bal_problem.num_points] = bal_problem.points
    pts = jnp.asarray(pts, dtype)
    if mesh is not None:
        shard_p = NamedSharding(mesh, P("obs"))
        repl = NamedSharding(mesh, P())

        def put(a, s):
            return jax.device_put(a, s)

        ell = ELLProblem(
            obs=put(ell.obs, NamedSharding(mesh, P("obs", None, None))),
            cam_onehot=put(ell.cam_onehot, NamedSharding(mesh, P("obs", None, None))),
            mask=put(ell.mask, NamedSharding(mesh, P("obs", None))),
            num_cameras=ell.num_cameras,
        )
        pts = put(pts, NamedSharding(mesh, P("obs", None)))
        cams = put(cams, repl)
        step = jax.jit(
            functools.partial(lm_step_ell, cg_iters=cg_iters),
            out_shardings=BAState(
                repl, NamedSharding(mesh, P("obs", None)), repl, repl
            ),
        )
    else:
        step = jax.jit(functools.partial(lm_step_ell, cg_iters=cg_iters))
    radius = jnp.asarray(1e4, dtype)
    state = BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
    for _ in range(num_iterations):
        state = BAState(*step(state.cams, state.pts, ell, state.radius))
    return jax.block_until_ready(state)


# Measurement notes (TPU v5e via remote tunnel, BAL-16-22106 shape, f32):
#   scatter pipeline (sharded_ba): lm_step cg=10 = 24.2 ms (41 it/s)
#   ELL pipeline: matvec 1.53 ms vs 1.74, eval 2.4 ms, but full step 52.8 ms
#   — the one-hot broadcast einsums in the setup phase dominate on this
#   stack. Kept as an alternative: the layout wins when num_cameras grows
#   (one-hot becomes a real MXU matmul) and it is the natural sharded
#   layout for point-partitioned multi-chip runs (point state shard-local).
