"""Mesh-sharded bundle-adjustment LM step.

The multi-chip execution tier (SURVEY.md §5.8): the reference's entire
parallel inventory is a thread pool + ParallelFor over residual blocks plus
single-GPU CUDA offload; here the same data-parallel axis — observations —
is laid out over a `jax.sharding.Mesh` and the whole LM inner step (batched
forward-mode Jacobians, CGNR normal-equations CG, parameter update) is one
jit under GSPMD:

 - observation arrays (camera index, point index, pixel) are sharded over
   the 'obs' mesh axis; parameter state (cameras, points) is replicated;
 - per-observation Jacobian blocks never leave their shard: J v and the
   J^T u scatter-adds are computed shard-locally and XLA inserts the
   all-reduce (psum over ICI) for the replicated outputs — exactly the
   "reduce-scatter of J^T r" plan of SURVEY.md §5.7;
 - deterministic: reduction order is fixed by the mesh, replicating the
   reference's reproducibility-by-construction (§5.2).

This module is self-contained over plain arrays (cams (C,9), pts (P,3))
— the shape the generic CompiledProgram lowers BA problems to anyway — so
it is also the performance benchmark path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.bal import snavely_reprojection_residual


def make_mesh(n_devices: "int | None" = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _residual_and_blocks(cam, pt, ob):
    """Per-observation residual (2,) + Jacobian blocks (2,9), (2,3) by
    forward-mode AD (the Jet replacement)."""
    def f(c, p):
        return snavely_reprojection_residual(c, p, ob)

    r = f(cam, pt)
    Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam, pt)
    return r, Jc, Jp


class BAState(NamedTuple):
    cams: jax.Array  # (C, 9)
    pts: jax.Array  # (P, 3)
    radius: jax.Array  # scalar trust region radius
    cost: jax.Array


class SortedSegments(NamedTuple):
    """Precomputed orderings so every J^T-side reduction is a sorted
    segment-sum instead of a random scatter-add — the TPU-native analog of
    the reference's cumulative-nnz row partitioning for threaded SpMV
    (block_sparse_matrix.cc). Built once per problem structure."""

    cam_perm: jax.Array  # (N,) observation order sorted by camera
    cam_sorted: jax.Array  # (N,) camera ids under cam_perm
    pt_perm: jax.Array  # (N,)
    pt_sorted: jax.Array  # (N,)


def build_sorted_segments(camera_index, point_index) -> SortedSegments:
    oc = np.argsort(np.asarray(camera_index), kind="stable")
    op = np.argsort(np.asarray(point_index), kind="stable")
    return SortedSegments(
        cam_perm=jnp.asarray(oc),
        cam_sorted=jnp.asarray(np.asarray(camera_index)[oc]),
        pt_perm=jnp.asarray(op),
        pt_sorted=jnp.asarray(np.asarray(point_index)[op]),
    )


def _segment_reduce(contrib, perm, sorted_ids, num_segments):
    """Deterministic sorted segment-sum reduction."""
    c = jnp.take(contrib, perm, axis=0)
    return jax.ops.segment_sum(
        c, sorted_ids, num_segments=num_segments, indices_are_sorted=True
    )


def ba_cost(cams, pts, cam_idx, pt_idx, obs, w=None):
    r = jax.vmap(snavely_reprojection_residual)(cams[cam_idx], pts[pt_idx], obs)
    if w is not None:
        r = r * w[:, None]
    return 0.5 * jnp.sum(r * r)


def _evaluate(cams, pts, cam_idx, pt_idx, obs, w=None):
    """residuals + per-obs Jacobian blocks, batched. `w` is a 0/1 mask for
    shard-padding rows (mesh divisibility) — zero rows contribute nothing."""
    r, Jc, Jp = jax.vmap(_residual_and_blocks)(cams[cam_idx], pts[pt_idx], obs)
    if w is not None:
        r = r * w[:, None]
        Jc = Jc * w[:, None, None]
        Jp = Jp * w[:, None, None]
    return r, Jc, Jp


def _jtj_matvec(Jc, Jp, cam_idx, pt_idx, vc, vp, D2c, D2p, segs=None):
    """(J'J + D^2) [vc; vp] without materializing J (two SpMV passes)."""
    jv = jnp.einsum("bri,bi->br", Jc, vc[cam_idx]) + jnp.einsum(
        "bri,bi->br", Jp, vp[pt_idx]
    )
    rc, rp = _make_reducers(cam_idx, pt_idx, vc.shape[0], vp.shape[0], segs)
    gc = rc(jnp.einsum("bri,br->bi", Jc, jv))
    gp = rp(jnp.einsum("bri,br->bi", Jp, jv))
    return gc + D2c * vc, gp + D2p * vp


def _make_reducers(cam_idx, pt_idx, C, P, segs):
    if segs is None:
        def rc(contrib):
            return jnp.zeros((C, contrib.shape[1]), contrib.dtype).at[cam_idx].add(contrib)

        def rp(contrib):
            return jnp.zeros((P, contrib.shape[1]), contrib.dtype).at[pt_idx].add(contrib)

    else:
        def rc(contrib):
            return _segment_reduce(contrib, segs.cam_perm, segs.cam_sorted, C)

        def rp(contrib):
            return _segment_reduce(contrib, segs.pt_perm, segs.pt_sorted, P)

    return rc, rp


def lm_step(cams, pts, cam_idx, pt_idx, obs, radius, w=None, cg_iters: int = 10,
            segs=None):
    """One complete LM iteration: evaluate -> CG on the scaled normal
    equations -> candidate -> accept/reject + radius update. Pure function
    of arrays; jit/shard it whole."""
    r, Jc, Jp = _evaluate(cams, pts, cam_idx, pt_idx, obs, w)
    cost = 0.5 * jnp.sum(r * r)
    reduce_c, reduce_p = _make_reducers(
        cam_idx, pt_idx, cams.shape[0], pts.shape[0], segs
    )

    # gradient and jacobi scaling. Scaled column norms and the scaled RHS
    # are elementwise functions of the unscaled reductions (col(Js)^2 =
    # s^2 col(J)^2, Js^T r = s * J^T r), so only 4 reduction passes are
    # needed, not 8.
    gc = reduce_c(jnp.einsum("bri,br->bi", Jc, r))
    gp = reduce_p(jnp.einsum("bri,br->bi", Jp, r))
    d2c = reduce_c(jnp.einsum("bri,bri->bi", Jc, Jc))
    d2p = reduce_p(jnp.einsum("bri,bri->bi", Jp, Jp))
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    Jc_s = Jc * sc[cam_idx][:, None, :]
    Jp_s = Jp * sp[pt_idx][:, None, :]
    diag_c = jnp.clip(sc * sc * d2c, 1e-6, 1e32)
    diag_p = jnp.clip(sp * sp * d2p, 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius

    rhs_c = sc * gc
    rhs_p = sp * gp

    # Jacobi-preconditioned CG on the scaled normal equations.
    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = _jtj_matvec(Jc_s, Jp_s, cam_idx, pt_idx, pc, pp, D2c, D2p, segs)
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
    init = (
        jnp.zeros_like(cams),
        jnp.zeros_like(pts),
        rhs_c,
        rhs_p,
        zc0,
        zp0,
        rz0,
    )
    yc, yp, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    step_c, step_p = -yc, -yp

    # model cost change in scaled coordinates
    jstep = jnp.einsum("bri,bi->br", Jc_s, step_c[cam_idx]) + jnp.einsum(
        "bri,bi->br", Jp_s, step_p[pt_idx]
    )
    model_cost_change = -jnp.sum(jstep * (r + jstep / 2.0))

    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    new_cost = ba_cost(new_cams, new_pts, cam_idx, pt_idx, obs, w)
    rel_decrease = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = (model_cost_change > 0) & (rel_decrease > 1e-3)

    cams_out = jnp.where(accept, new_cams, cams)
    pts_out = jnp.where(accept, new_pts, pts)
    radius_out = jnp.where(
        accept,
        jnp.minimum(
            radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rel_decrease - 1.0) ** 3),
            1e16,
        ),
        radius / 2.0,
    )
    cost_out = jnp.where(accept, new_cost, cost)
    return BAState(cams_out, pts_out, radius_out, cost_out)


def make_sharded_lm_step(mesh: Mesh, cg_iters: int = 10):
    """jit lm_step with observation arrays sharded over the mesh and the
    parameter state replicated; GSPMD inserts the ICI all-reduces."""
    obs_sharded = NamedSharding(mesh, P("obs"))
    obs_sharded2 = NamedSharding(mesh, P("obs", None))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        functools.partial(lm_step, cg_iters=cg_iters),
        in_shardings=(repl, repl, obs_sharded, obs_sharded, obs_sharded2, repl,
                      obs_sharded),
        out_shardings=BAState(repl, repl, repl, repl),
    )


def _pad_to_multiple(a, m, axis=0):
    n = a.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return a, np.ones(n)
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    w = np.concatenate([np.ones(n), np.zeros(pad)])
    return np.pad(np.asarray(a), widths), w


def solve_ba(bal_problem, num_iterations=10, mesh=None, cg_iters=10,
             dtype=jnp.float64):
    """Run `num_iterations` LM steps on a BALProblem; returns final BAState.

    With a mesh, observations are sharded across devices."""
    cams = jnp.asarray(bal_problem.cameras, dtype)
    pts = jnp.asarray(bal_problem.points, dtype)
    if mesh is not None:
        n_dev = mesh.devices.size
        cam_idx, w = _pad_to_multiple(bal_problem.camera_index, n_dev)
        pt_idx, _ = _pad_to_multiple(bal_problem.point_index, n_dev)
        obs, _ = _pad_to_multiple(bal_problem.observations, n_dev)
        step_fn = make_sharded_lm_step(mesh, cg_iters)
        sh1 = NamedSharding(mesh, P("obs"))
        sh2 = NamedSharding(mesh, P("obs", None))
        cam_idx = jax.device_put(jnp.asarray(cam_idx), sh1)
        pt_idx = jax.device_put(jnp.asarray(pt_idx), sh1)
        obs = jax.device_put(jnp.asarray(obs, dtype), sh2)
        w = jax.device_put(jnp.asarray(w, dtype), sh1)
    else:
        cam_idx = jnp.asarray(bal_problem.camera_index)
        pt_idx = jnp.asarray(bal_problem.point_index)
        obs = jnp.asarray(bal_problem.observations, dtype)
        w = None
        # Measured on TPU v5e: XLA's scatter-add beats sorted segment-sums
        # here (the permutation gathers cost more than the scatter saves);
        # SortedSegments remains available via lm_step(segs=...).
        step_fn = jax.jit(functools.partial(lm_step, cg_iters=cg_iters))
    radius = jnp.asarray(1e4, dtype)
    state = BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
    for _ in range(num_iterations):
        state = BAState(
            *step_fn(state.cams, state.pts, cam_idx, pt_idx, obs, state.radius, w)
        )
    return jax.block_until_ready(state)
