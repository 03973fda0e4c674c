"""BA LM pipeline with Pallas segment kernels on the point axis.

The scatter-free variant of parallel/sharded_ba.py for single-device TPU
runs: observations are stored point-sorted; point-side gather/scatter use
the Pallas one-hot MXU kernels (ops/pallas_kernels.py — measured 4.7x
faster than XLA scatter inside the CG loop on v5e), camera-side ops use
explicit one-hot matmuls at float32 precision (the default TPU matmul
precision is bf16 — enough to corrupt CG directions).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bal import snavely_reprojection_residual
from ..ops import pallas_kernels as pk
from .sharded_ba import BAState

_PREC = jax.lax.Precision.HIGHEST


class PallasBAPlan(NamedTuple):
    cam_idx: jax.Array  # (N,) point-sorted order
    pt_ids: jax.Array  # (N,) non-decreasing
    obs: jax.Array  # (N, 2)
    onehot_cam: jax.Array  # (N, C) f32
    tile_starts: jax.Array
    max_rows: int
    num_points: int
    num_cameras: int


def build_plan(bal_problem, dtype=jnp.float32) -> PallasBAPlan:
    op = np.argsort(bal_problem.point_index, kind="stable")
    cam_sorted = bal_problem.camera_index[op]
    pt_sorted = bal_problem.point_index[op].astype(np.int32)
    C = bal_problem.num_cameras
    ts, mr = pk.plan_block_tiles(pt_sorted, bal_problem.num_points)
    onehot = (cam_sorted[:, None] == np.arange(C)[None, :]).astype(np.float32)
    return PallasBAPlan(
        cam_idx=jnp.asarray(cam_sorted),
        pt_ids=jnp.asarray(pt_sorted),
        obs=jnp.asarray(bal_problem.observations[op], dtype),
        onehot_cam=jnp.asarray(onehot, dtype),
        tile_starts=jnp.asarray(ts),
        max_rows=mr,
        num_points=bal_problem.num_points,
        num_cameras=C,
    )


def _evaluate(cams, pts, plan: PallasBAPlan):
    camg = jnp.matmul(plan.onehot_cam, cams, precision=_PREC)
    ptg = pk.segment_block_expand(
        pts, plan.pt_ids, plan.tile_starts, plan.obs.shape[0],
        max_rows=plan.max_rows,
    )

    def per_obs(cam, pt, ob):
        def f(c, p):
            return snavely_reprojection_residual(c, p, ob)

        r = f(cam, pt)
        Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam, pt)
        return r, Jc, Jp

    return jax.vmap(per_obs)(camg, ptg, plan.obs)


def _reduce_cam(plan, contrib):
    return jnp.einsum("nc,nk->ck", plan.onehot_cam, contrib, precision=_PREC)


def _reduce_pt(plan, contrib):
    return pk.segment_block_sum(
        contrib, plan.pt_ids, plan.tile_starts, plan.num_points,
        max_rows=plan.max_rows,
    )[: plan.num_points]


def _matvec(Jc, Jp, plan, vc, vp, D2c, D2p):
    vcg = jnp.matmul(plan.onehot_cam, vc, precision=_PREC)
    vpg = pk.segment_block_expand(
        vp, plan.pt_ids, plan.tile_starts, plan.obs.shape[0], max_rows=plan.max_rows
    )
    jv = jnp.einsum("bri,bi->br", Jc, vcg, precision=_PREC) + jnp.einsum(
        "bri,bi->br", Jp, vpg, precision=_PREC
    )
    gc = _reduce_cam(plan, jnp.einsum("bri,br->bi", Jc, jv, precision=_PREC))
    gp = _reduce_pt(plan, jnp.einsum("bri,br->bi", Jp, jv, precision=_PREC))
    return gc + D2c * vc, gp + D2p * vp


def lm_step_pallas(cams, pts, plan: PallasBAPlan, radius, cg_iters: int = 10):
    """One LM iteration, same semantics as sharded_ba.lm_step."""
    r, Jc, Jp = _evaluate(cams, pts, plan)
    cost = 0.5 * jnp.sum(r * r)
    ein = functools.partial(jnp.einsum, precision=_PREC)

    gc = _reduce_cam(plan, ein("bri,br->bi", Jc, r))
    gp = _reduce_pt(plan, ein("bri,br->bi", Jp, r))
    d2c = _reduce_cam(plan, ein("bri,bri->bi", Jc, Jc))
    d2p = _reduce_pt(plan, ein("bri,bri->bi", Jp, Jp))
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    scg = jnp.matmul(plan.onehot_cam, sc, precision=_PREC)
    spg = pk.segment_block_expand(
        sp, plan.pt_ids, plan.tile_starts, plan.obs.shape[0], max_rows=plan.max_rows
    )
    Jc_s = Jc * scg[:, None, :]
    Jp_s = Jp * spg[:, None, :]
    diag_c = jnp.clip(_reduce_cam(plan, ein("bri,bri->bi", Jc_s, Jc_s)), 1e-6, 1e32)
    diag_p = jnp.clip(_reduce_pt(plan, ein("bri,bri->bi", Jp_s, Jp_s)), 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius
    rhs_c = _reduce_cam(plan, ein("bri,br->bi", Jc_s, r))
    rhs_p = _reduce_pt(plan, ein("bri,br->bi", Jp_s, r))

    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = _matvec(Jc_s, Jp_s, plan, pc, pp, D2c, D2p)
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

    vcg = jnp.matmul(plan.onehot_cam, step_c, precision=_PREC)
    vpg = pk.segment_block_expand(
        step_p, plan.pt_ids, plan.tile_starts, plan.obs.shape[0],
        max_rows=plan.max_rows,
    )
    jstep = ein("bri,bi->br", Jc_s, vcg) + ein("bri,bi->br", Jp_s, vpg)
    model_cost_change = -jnp.sum(jstep * (r + jstep / 2.0))

    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    r_new, _, _ = _evaluate(new_cams, new_pts, plan)
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


def solve_ba_pallas(bal_problem, num_iterations=10, cg_iters=10,
                    dtype=jnp.float32, interpret: bool = False):
    plan = build_plan(bal_problem, dtype)
    cams = jnp.asarray(bal_problem.cameras, dtype)
    pts = jnp.asarray(bal_problem.points, dtype)
    # plan is closed over (max_rows etc. must be trace-time static).
    step = jax.jit(
        lambda c, p, r: lm_step_pallas(c, p, plan, r, cg_iters=cg_iters)
    )
    radius = jnp.asarray(1e4, dtype)
    state = BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
    for _ in range(num_iterations):
        state = BAState(*step(state.cams, state.pts, state.radius))
    return jax.block_until_ready(state)


# Measurement notes (TPU v5e via remote tunnel, BAL-16-22106, f32, cg=10):
#   in isolation: pallas matvec 10x loop = 3.7 ms vs 17.4 ms XLA scatter
#   (4.7x); full lm_step 23.7 ms vs 24.4 ms — parity, because the Pallas
#   call boundaries fragment XLA fusion and this backend pays ~0.1-0.3 ms
#   per kernel launch, which re-absorbs the matvec win in the CG vector
#   ops. On deployments with normal launch overheads the matvec gain
#   should carry through; revisit fusing the CG axpy chain into the
#   kernels themselves (a full-CG Pallas megakernel) next round.
