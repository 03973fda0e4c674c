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


def _gather_cams(cams, cam_idx, onehot=None):
    """cams[cam_idx], as a one-hot MXU matmul when the one-hot is provided:
    a (B,) row gather costs ~20 ns/row on TPU regardless of width, while
    (B, C) @ (C, 9) is sub-0.1 ms for small camera counts."""
    if onehot is not None:
        return jnp.einsum("bc,ck->bk", onehot, cams,
                          precision=jax.lax.Precision.HIGHEST)
    return cams[cam_idx]


def ba_cost(cams, pts, cam_idx, pt_idx, obs, w=None, onehot=None):
    r = jax.vmap(snavely_reprojection_residual)(
        _gather_cams(cams, cam_idx, onehot), pts[pt_idx], obs
    )
    if w is not None:
        r = r * w[:, None]
    return 0.5 * jnp.sum(r * r)


def _evaluate(cams, pts, cam_idx, pt_idx, obs, w=None, onehot=None):
    """residuals + per-obs Jacobian blocks, batched. `w` is a 0/1 mask for
    shard-padding rows (mesh divisibility) — zero rows contribute nothing."""
    r, Jc, Jp = jax.vmap(_residual_and_blocks)(
        _gather_cams(cams, cam_idx, onehot), pts[pt_idx], obs
    )
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


# --------------------------------------------------------------------------
# Flattened-lane J algebra. The (B, r, t) block tensors are tile-padded to
# (8, 128) in HBM — 57x inflation for (B, 2, 9) f32 — and as CG
# loop-invariants they are re-read every iteration, which bounds the CG at
# HBM bandwidth on the padding (measured: 1.75 ms/iteration at 83k obs,
# ~= the 686 MB padded read at ~383 GB/s). Packing both blocks into ONE
# (B, r*(tc+tp)) 2-D array (128-lane padding only, ~16x less traffic) and
# doing the r/t-group contractions as matmuls against tiny constant 0/1
# selector matrices (MXU) removes that bound. Same trick as ops/flatops.py.
# --------------------------------------------------------------------------


def _flat_selectors(r, tc, tp, dtype):
    """R: (tc+tp, L) replicates a per-obs [cam|pt] tangent row across the r
    row-groups of lanes; S: (L, r) sums each row-group. U = S.T broadcasts
    per-row values; P = R.T sums over rows per tangent position."""
    L = r * (tc + tp)
    R = np.zeros((tc + tp, L))
    S = np.zeros((L, r))
    for i in range(r):
        R[:tc, i * tc:(i + 1) * tc] = np.eye(tc)
        R[tc:, r * tc + i * tp: r * tc + (i + 1) * tp] = np.eye(tp)
        S[i * tc:(i + 1) * tc, i] = 1.0
        S[r * tc + i * tp: r * tc + (i + 1) * tp, i] = 1.0
    return jnp.asarray(R, dtype), jnp.asarray(S, dtype)


_HI = jax.lax.Precision.HIGHEST

# Promote the small exact solves inside lm_step_schur to f64 (emulated on
# TPU). Read at trace time. Measured on v5e at the BAL-16 shape: the f64
# per-point 3x3 lanes cost ~1 ms and are REQUIRED for step quality (f32
# loses ~6% cost after 15 iterations to cancellation); the f64 9C x 9C
# solve costs ~11 ms of emulation and adds nothing -> off by default.
PRECISE_POINT_SOLVES = True
PRECISE_SCHUR_SOLVE = False


def _mmf(a, b):
    return jnp.einsum("bl,lo->bo", a, b, precision=_HI)


def _outer_selectors(r, ta, tb, dtype):
    """Constants for sum_r outer(A_r, B_r) on flat lanes: A (B, r*ta),
    B (B, r*tb) -> (B, ta*tb) with out[i*tb+j] = sum_r A[r*ta+i] B[r*tb+j],
    computed as (A@EA * B@EB) @ E3 — three MXU matmuls, no rank-3."""
    EA = np.kron(np.eye(r * ta), np.ones((1, tb)))
    EB = np.kron(np.eye(r), np.kron(np.ones((1, ta)), np.eye(tb)))
    E3 = np.kron(np.ones((r, 1)), np.eye(ta * tb))
    return (jnp.asarray(EA, dtype), jnp.asarray(EB, dtype),
            jnp.asarray(E3, dtype))


def _outer_flat(A, B, sel):
    EA, EB, E3 = sel
    return _mmf(_mmf(A, EA) * _mmf(B, EB), E3)


def _chol3_flat(m):
    """Closed-form Cholesky of symmetric 3x3 blocks stored as (N, 9) flat
    rows [a b c; b d e; c e f] -> L lanes (L11,L21,L31,L22,L32,L33)."""
    a, b, c = m[:, 0], m[:, 1], m[:, 2]
    d, e, f = m[:, 4], m[:, 5], m[:, 8]
    L11 = jnp.sqrt(a)
    L21 = b / L11
    L31 = c / L11
    L22 = jnp.sqrt(d - L21 * L21)
    L32 = (e - L21 * L31) / L22
    L33 = jnp.sqrt(f - L31 * L31 - L32 * L32)
    return L11, L21, L31, L22, L32, L33


def _inv_lower3(L):
    """K = L^{-1} for lower-triangular 3x3 lanes -> (N, 9) flat dense
    (upper entries zero)."""
    L11, L21, L31, L22, L32, L33 = L
    K11 = 1.0 / L11
    K22 = 1.0 / L22
    K33 = 1.0 / L33
    K21 = -L21 * K11 * K22
    K31 = (L21 * L32 - L31 * L22) * K11 * K22 * K33
    K32 = -L32 * K22 * K33
    z = jnp.zeros_like(K11)
    return jnp.stack([K11, z, z, K21, K22, z, K31, K32, K33], axis=1)


def _solve_lower3_t(L, v):
    """x = L^{-T} v for lower-triangular 3x3 lanes, v (N, 3)."""
    L11, L21, L31, L22, L32, L33 = L
    x3 = v[:, 2] / L33
    x2 = (v[:, 1] - L32 * x3) / L22
    x1 = (v[:, 0] - L21 * x2 - L31 * x3) / L11
    return jnp.stack([x1, x2, x3], axis=1)


def _matmul_selectors(ti, tk, tj, dtype):
    """Constants for flat-lane matmul C[i*tj+j] = sum_k A[i*tk+k] B[k*tj+j]
    (A (N, ti*tk) i-major, B (N, tk*tj) k-major)."""
    EA = np.kron(np.eye(ti * tk), np.ones((1, tj)))
    EB = np.kron(np.ones((1, ti)), np.eye(tk * tj))
    E3 = np.kron(np.eye(ti), np.kron(np.ones((tk, 1)), np.eye(tj)))
    return (jnp.asarray(EA, dtype), jnp.asarray(EB, dtype),
            jnp.asarray(E3, dtype))


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

    # One flat (B, r*(tc+tp)) Jacobian array for the whole step: lane-group
    # algebra via the selector matmuls (see _flat_selectors).
    B, rr, tc = Jc.shape
    tp = Jp.shape[2]
    R, S = _flat_selectors(rr, tc, tp, Jc.dtype)
    J = jnp.concatenate([Jc.reshape(B, rr * tc), Jp.reshape(B, rr * tp)], axis=1)

    def split(ct_pt):  # (B, tc+tp) -> (B, tc), (B, tp)
        return ct_pt[:, :tc], ct_pt[:, tc:]

    # gradient and jacobi scaling. Scaled column norms and the scaled RHS
    # are elementwise functions of the unscaled reductions (col(Js)^2 =
    # s^2 col(J)^2, Js^T r = s * J^T r), so only 4 reduction passes are
    # needed, not 8.
    jtr = _mmf(J * _mmf(r, S.T), R.T)        # (B, tc+tp): J' r per obs
    jsq = _mmf(J * J, R.T)                   # per-obs column norms
    gcb, gpb = split(jtr)
    d2cb, d2pb = split(jsq)
    gc = reduce_c(gcb)
    gp = reduce_p(gpb)
    d2c = reduce_c(d2cb)
    d2p = reduce_p(d2pb)
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    Js = J * _mmf(jnp.concatenate([sc[cam_idx], sp[pt_idx]], axis=1), R)
    diag_c = jnp.clip(sc * sc * d2c, 1e-6, 1e32)
    diag_p = jnp.clip(sp * sp * d2p, 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius

    rhs_c = sc * gc
    rhs_p = sp * gp

    # Jacobi-preconditioned CG on the scaled normal equations.
    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def matvec(vc, vp):
        seg = jnp.concatenate([vc[cam_idx], vp[pt_idx]], axis=1)
        jv = _mmf(Js * _mmf(seg, R), S)      # (B, r)
        back = _mmf(Js * _mmf(jv, S.T), R.T)
        cb, pb = split(back)
        return reduce_c(cb) + D2c * vc, reduce_p(pb) + D2p * vp

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = matvec(pc, pp)
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
    segs_step = jnp.concatenate([step_c[cam_idx], step_p[pt_idx]], axis=1)
    jstep = _mmf(Js * _mmf(segs_step, R), S)
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


def _point_ops(pt_idx, P, pallas_plan=None, pallas_interpret=False):
    """(reduce_p, expand_p) — XLA scatter/gather, or the Mosaic tiled
    one-hot kernels when a plan over POINT-SORTED observations is given."""
    if pallas_plan is not None:
        from ..ops import pallas_kernels as pk

        tile_starts, max_rows = pallas_plan
        ts = jnp.asarray(np.asarray(tile_starts, np.int32))
        ids32 = pt_idx.astype(jnp.int32)
        Bn = pt_idx.shape[0]

        def reduce_p(contrib):  # (B, k) -> (P, k)
            return pk.segment_block_sum(
                contrib, ids32, ts, P, max_rows=max_rows,
                interpret=pallas_interpret,
            )[:P]

        def expand_p(vals):  # (P, k) -> (B, k)
            return pk.segment_block_expand(
                vals, ids32, ts, Bn, max_rows=max_rows,
                interpret=pallas_interpret,
            )

        def spread_p(Y, cam_ids, C, tp, tc, Jc=None):  # fused A assembly
            out = pk.segment_spread_sum(
                Y, cam_ids.astype(jnp.int32), ids32, ts, P, C, tp, tc,
                max_rows=max_rows, interpret=pallas_interpret, Jc=Jc,
            )
            if Jc is not None:
                return out[0][:P], out[1]
            return out[:P]
    else:
        def reduce_p(contrib):
            return jnp.zeros(
                (P, contrib.shape[1]), contrib.dtype
            ).at[pt_idx].add(contrib)

        def expand_p(vals):
            return jnp.take(vals, pt_idx, axis=0)

        spread_p = None

    return reduce_p, expand_p, spread_p


def _residual_and_flat_row(cam, pt, ob):
    """Per-observation residual (2,) + FLAT Jacobian lanes (24,): the
    reshape/concat happens inside the vmapped function so the batched
    output is 2-D from the start — XLA never materializes the rank-3
    (B, 2, 9)/(B, 2, 3) block tensors of _residual_and_blocks."""
    def f(c, p):
        return snavely_reprojection_residual(c, p, ob)

    r = f(cam, pt)
    Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam, pt)
    return r, jnp.concatenate([Jc.reshape(-1), Jp.reshape(-1)])


def _evaluate_flat(cams, pts, cam_idx, obs, w, oh_gather, expand_p):
    """(r, J): residuals + the flat (B, r*(tc+tp)) Jacobian."""
    r, J = jax.vmap(_residual_and_flat_row)(
        _gather_cams(cams, cam_idx, oh_gather), expand_p(pts), obs
    )
    if w is not None:
        r = r * w[:, None]
        J = J * w[:, None]
    return r, J


def _evaluate_flat_T(cams, pts, cam_idx, obs_T, w, oh_gather, expand_p_T):
    """Transposed-layout evaluation: residuals (2, B) + flat Jacobian
    lanes (24, B). (B, k) arrays with k < 128 are padded to 128 lanes in
    TPU HBM (up to 64x real bytes for (B, 2)); producing the evaluation
    lane-major via vmap(out_axes=1) keeps every array at its logical
    size. obs_T is (2, B); expand_p_T returns (3, B)."""
    camg_T = jnp.einsum("bc,ck->kb", oh_gather, cams, precision=_HI)
    pts_T = expand_p_T(pts)

    def per_obs(cam, pt, ob):
        return _residual_and_flat_row(cam, pt, ob)

    r_T, J_T = jax.vmap(per_obs, in_axes=(1, 1, 1), out_axes=1)(
        camg_T, pts_T, obs_T
    )
    if w is not None:
        r_T = r_T * w[None, :]
        J_T = J_T * w[None, :]
    return r_T, J_T


def _schur_core(J, r, radius, cam_idx, oh_gather, onehot, reduce_p, expand_p,
                C, P, rr=2, tc=9, tp=3, spread_p=None, w=None,
                axis_name=None):
    """Exact dense-Schur LM step math from a flat-lane evaluation:
    returns (step_c, step_p, sc, sp, model_cost_change).

    With `axis_name` (under shard_map, SURVEY §5.7 point sharding): the
    POINT state and observations are device-local shards; every
    camera-side aggregate — gradient/diag reductions, F'F, the S Gram
    A'A, the rhs weight A'u, and the scalar model-cost terms — is closed
    over the mesh with ONE psum each, after which the small replicated
    9C x 9C solve runs identically on every device. Point elimination and
    back-substitution never leave the shard."""
    B = r.shape[0]
    R, S_sel = _flat_selectors(rr, tc, tp, J.dtype)

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def reduce_c(contrib):  # (B, k) -> (C, k) via MXU (+ mesh psum)
        return jnp.einsum("bk,bc->ck", contrib, onehot, precision=_HI)

    dt = J.dtype
    # ONE fused point reduction for the whole iteration: the per-point
    # Jacobi scale sp is a per-point CONSTANT, so scaling commutes with the
    # segment sum — reduce the UNSCALED E'r rows, diag rows, and E'E outer
    # rows together, then scale per point (drops the second reduce pass the
    # scaled-then-reduced formulation needed).
    jtr = _mmf(J * _mmf(r, S_sel.T), R.T)
    jsq = _mmf(J * J, R.T)
    J_p_u = J[:, rr * tc:]  # unscaled point lanes (B, 6)
    jptjp_u = _outer_flat(J_p_u, J_p_u, _outer_selectors(rr, tp, tp, dt))
    red = reduce_p(
        jnp.concatenate([jtr[:, tc:], jsq[:, tc:], jptjp_u], axis=1)
    )  # (P, 3+3+9)
    gp = red[:, :tp]
    d2p = red[:, tp : 2 * tp]
    ete_u = red[:, 2 * tp :]  # (P, 9) unscaled E'E lanes
    gc_d2c = psum(reduce_c(jnp.concatenate(
        [jtr[:, :tc], jsq[:, :tc]], axis=1)))
    gc, d2c = gc_d2c[:, :tc], gc_d2c[:, tc:]
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    diag_c = jnp.clip(sc * sc * d2c, 1e-6, 1e32)
    diag_p = jnp.clip(sp * sp * d2p, 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius

    # point elimination: M_p = sp sp' ⊙ (sum Jp'Jp) + D2p (3x3), E'r = sp g_p
    # — per-point algebra straight off the fused reduction, no extra pass.
    sp_outer = _outer_flat(sp, sp, _outer_selectors(1, tp, tp, dt))  # (P, 9)
    diag_embed = np.zeros((tp, tp * tp))
    for i in range(tp):
        diag_embed[i, i * tp + i] = 1.0  # D2p -> diagonal lanes
    M_flat = ete_u * sp_outer + _mmf(D2p, jnp.asarray(diag_embed, dt))
    etb = sp * gp  # (P, 3)
    # The tiny per-point factorizations are numerically delicate in f32
    # (cancellation in the Cholesky recurrences); promote them per the
    # module flags (P-sized elementwise lanes / one 9C x 9C solve).
    dt3 = jnp.float64 if PRECISE_POINT_SOLVES else dt
    L3 = _chol3_flat(M_flat.astype(dt3))
    Kf64 = _inv_lower3(L3)  # (P, 9) = L^{-1} dense flat
    Kf = Kf64.astype(dt)

    # ONE fused point expand for all per-obs point data: [Kf (9), sp (3)]
    exp = expand_p(jnp.concatenate([Kf, sp], axis=1))  # (B, 12)
    Kf_g = exp[:, : tp * tp]
    sp_g = exp[:, tp * tp:]
    Js = J * _mmf(
        jnp.concatenate([_gather_cams(sc, cam_idx, oh_gather), sp_g], axis=1), R
    )
    Js_c = Js[:, : rr * tc]  # (B, 18)
    Js_p = Js[:, rr * tc:]   # (B, 6)

    # A = L^{-1} W' stacked per point: rows 3p+i, cols 9c+j
    W = _outer_flat(Js_p, Js_c, _outer_selectors(rr, tp, tc, dt))  # (B,27)
    GA, GB, G3 = _matmul_selectors(tp, tp, tc, dt)
    Y = _mmf(_mmf(Kf_g, GA) * _mmf(W, GB), G3)  # (B,27)
    if spread_p is not None:
        # fused Mosaic spread+reduce: the (B, tp*C*tc) spread tensor stays
        # in VMEM (ops/pallas_kernels.segment_spread_sum), and the same
        # kernel accumulates F'F from the scaled camera lanes (no (B, 162)
        # outer-product intermediates in HBM)
        Yk = Y if w is None else Y * w[:, None]
        Jck = Js_c if w is None else Js_c * w[:, None]
        A, ftf_flat = spread_p(Yk, cam_idx, C, tp, tc, Jc=Jck)
        A = A.reshape(P * tp, C * tc)
        FtF = ftf_flat.reshape(C, tc, tc)
    else:
        H1 = jnp.asarray(
            np.kron(np.eye(tp), np.kron(np.ones((1, C)), np.eye(tc))), dt
        )  # (27, 3*C*9)
        H2 = jnp.asarray(
            np.kron(np.ones((1, tp)), np.kron(np.eye(C), np.ones((1, tc)))), dt
        )  # (C, 3*C*9)
        T = _mmf(Y, H1) * _mmf(onehot, H2)  # (B, tp*C*tc), lanes (i, c, j)
        A = reduce_p(T).reshape(P * tp, C * tc)
        # S = blockdiag(F'F) + D2c - A'A ; rhs = F'r - A' (L^{-1} E'r)
        jctjc = _outer_flat(Js_c, Js_c, _outer_selectors(rr, tc, tc, dt))
        FtF = reduce_c(jctjc).reshape(C, tc, tc)
    FtF = psum(FtF)
    AtA = psum(jnp.einsum("kf,kg->fg", A, A, precision=_HI))
    S = jnp.einsum("cij,cd->cidj", FtF, jnp.eye(C, dtype=dt)).reshape(
        C * tc, C * tc
    )
    S = S - AtA
    S = S + jnp.diag(D2c.reshape(-1))
    # u = L^{-1} etb, closed form on lanes
    u = jnp.stack(
        [sum(Kf64[:, i * tp + k] * etb[:, k].astype(dt3)
             for k in range(tp))
         for i in range(tp)], axis=1
    ).astype(dt)  # (P, 3)
    ftb = (sc * gc).reshape(-1)
    rhs = ftb - psum(
        jnp.einsum("kf,k->f", A, u.reshape(-1), precision=_HI))

    # dense 9C x 9C solve (tiny; S can be ill-conditioned -> flag)
    dtS = jnp.float64 if PRECISE_SCHUR_SOLVE else dt
    Ls = jnp.linalg.cholesky(S.astype(dtS))
    if dtS == jnp.float32:
        # blocked explicit L^{-1} (solvers/linear/dense.tri_inverse_lower):
        # substitution is sequential on TPU, two MXU matvecs are not
        from ..solvers.linear.dense import tri_inverse_lower

        Linv = tri_inverse_lower(Ls)
        z = (Linv.T @ (Linv @ rhs.astype(dtS))).astype(dt)
    else:
        z = jax.scipy.linalg.cho_solve((Ls, True), rhs.astype(dtS)).astype(dt)

    # back substitution: y_p = L^{-T} (u_p - A_p z)
    Az = jnp.einsum("kf,f->k", A, z, precision=_HI).reshape(P, tp)
    y_p = _solve_lower3_t(L3, (u - Az).astype(dt3)).astype(dt)

    step_c = -z.reshape(C, tc)
    step_p = -y_p

    # Exact-solve identity: with m(d) = g_s'd + 1/2 d'J_s'J_s d and
    # (J_s'J_s + D^2) d = -g_s,  -m(d) = -1/2 g_s'd + 1/2 d'D^2 d — all
    # reduced-space dot products, no B-wide J pass for the model cost.
    g_dot = jnp.sum((sc * gc) * step_c) + psum(
        jnp.sum((sp * gp) * step_p))
    d2_dot = jnp.sum(D2c * step_c * step_c) + psum(
        jnp.sum(D2p * step_p * step_p))
    model_cost_change = -0.5 * g_dot + 0.5 * d2_dot
    return step_c, step_p, sc, sp, model_cost_change


def lm_step_schur(cams, pts, cam_idx, pt_idx, obs, radius, w=None,
                  pallas_plan=None, pallas_interpret=False):
    """One LM iteration with an EXACT dense-Schur step: eliminate the
    points (E'E+D² is 3x3 block diagonal), assemble the reduced camera
    system S explicitly and Cholesky-solve it — no CG loop at all. The
    TPU shape of schur_complement_solver.cc:338 (DENSE_SCHUR): the only
    per-point scatters are three segment reductions; every camera-side
    aggregation is a one-hot matmul on the MXU (C is small, 9C x 9C dense
    S). Preferable to lm_step whenever 9*num_cameras is dense-solvable
    (the reference's guidance for BAL-sized camera counts).

    pallas_plan: (tile_starts, max_rows) from
    ops/pallas_kernels.plan_block_tiles over a POINT-SORTED observation
    order — the point segment sums and gathers then run as the Mosaic
    tiled one-hot kernels instead of XLA scatter/gather."""
    C = cams.shape[0]
    P = pts.shape[0]
    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=cams.dtype)  # (B, C)
    # reductions use a masked one-hot (padding rows vanish); gathers use the
    # unmasked one so padded rows still see real camera values (zeros could
    # produce NaN residuals that survive the w mask as NaN * 0).
    onehot = oh_gather if w is None else oh_gather * w[:, None]
    reduce_p, expand_p, spread_p = _point_ops(pt_idx, P, pallas_plan, pallas_interpret)

    r, J = _evaluate_flat(cams, pts, cam_idx, obs, w, oh_gather, expand_p)
    cost = 0.5 * jnp.sum(r * r)
    step_c, step_p, sc, sp, model_cost_change = _schur_core(
        J, r, radius, cam_idx, oh_gather, onehot, reduce_p, expand_p, C, P,
        spread_p=spread_p, w=w
    )

    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    r_new = jax.vmap(snavely_reprojection_residual)(
        _gather_cams(new_cams, cam_idx, oh_gather), expand_p(new_pts), obs
    )
    if w is not None:
        r_new = r_new * w[:, None]
    new_cost = 0.5 * jnp.sum(r_new * r_new)
    ok = jnp.isfinite(new_cost) & (model_cost_change > 0)
    rel_decrease = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = ok & (rel_decrease > 1e-3)

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


class SchurCarry(NamedTuple):
    """BAState + the cached (r, J) evaluation at (cams, pts): the candidate
    evaluation of an accepted step IS the next iteration's evaluation, so
    each LM iteration evaluates r+J exactly once (both are bandwidth-bound
    on TPU, so producing J alongside the candidate residuals is ~free)."""

    cams: jax.Array
    pts: jax.Array
    radius: jax.Array
    cost: jax.Array
    r: jax.Array
    J: jax.Array


def lm_step_schur_init(cams, pts, cam_idx, pt_idx, obs, radius, w=None,
                       pallas_plan=None, pallas_interpret=False,
                       axis_name=None) -> SchurCarry:
    C = cams.shape[0]
    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=cams.dtype)
    _, expand_p, _ = _point_ops(pt_idx, pts.shape[0], pallas_plan, pallas_interpret)
    r, J = _evaluate_flat(cams, pts, cam_idx, obs, w, oh_gather, expand_p)
    cost = 0.5 * jnp.sum(r * r)
    if axis_name:
        cost = jax.lax.psum(cost, axis_name)
    return SchurCarry(cams, pts, radius, cost, r, J)


def lm_step_schur_next(carry: SchurCarry, cam_idx, pt_idx, obs, w=None,
                       pallas_plan=None, pallas_interpret=False,
                       axis_name=None) -> SchurCarry:
    """lm_step_schur with the evaluation carried across iterations."""
    cams, pts, radius, cost, r, J = carry
    C = cams.shape[0]
    P = pts.shape[0]
    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=cams.dtype)
    onehot = oh_gather if w is None else oh_gather * w[:, None]
    reduce_p, expand_p, spread_p = _point_ops(pt_idx, P, pallas_plan, pallas_interpret)

    step_c, step_p, sc, sp, model_cost_change = _schur_core(
        J, r, radius, cam_idx, oh_gather, onehot, reduce_p, expand_p, C, P,
        spread_p=spread_p, w=w, axis_name=axis_name
    )
    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    r_new, J_new = _evaluate_flat(
        new_cams, new_pts, cam_idx, obs, w, oh_gather, expand_p
    )
    new_cost = 0.5 * jnp.sum(r_new * r_new)
    if axis_name:
        new_cost = jax.lax.psum(new_cost, axis_name)
    ok = jnp.isfinite(new_cost) & (model_cost_change > 0)
    rel_decrease = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = ok & (rel_decrease > 1e-3)

    radius_out = jnp.where(
        accept,
        jnp.minimum(
            radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rel_decrease - 1.0) ** 3),
            1e16,
        ),
        radius / 2.0,
    )
    return SchurCarry(
        jnp.where(accept, new_cams, cams),
        jnp.where(accept, new_pts, pts),
        radius_out,
        jnp.where(accept, new_cost, cost),
        jnp.where(accept, r_new, r),
        jnp.where(accept, J_new, J),
    )


def lm_step_schur_k(cams, pts, cam_idx, pt_idx, obs, radius, k=5, w=None,
                    pallas_plan=None, pallas_interpret=False,
                    axis_name=None):
    """k LM iterations in ONE jit via the evaluation carry: the flat J
    never leaves the compiled scope between iterations, so each iteration
    costs one r+J evaluation ((k+1)/k evaluations per LM step amortized
    vs 2 for lm_step_schur). Returns BAState after k steps."""
    carry = lm_step_schur_init(cams, pts, cam_idx, pt_idx, obs, radius, w,
                               pallas_plan, pallas_interpret, axis_name)

    def body(_, c):
        return lm_step_schur_next(c, cam_idx, pt_idx, obs, w,
                                  pallas_plan, pallas_interpret, axis_name)

    out = jax.lax.fori_loop(0, k, body, carry)
    return BAState(out.cams, out.pts, out.radius, out.cost)


# ---------------------------------------------------------------------------
# v2 pipeline: one-kernel dense-Schur assembly on transposed grouped lanes.
#
# Stage-profiled motivation (benchmarks/profile_schur_stages.py, v5e,
# BAL-16): of the 2.0 ms/iteration v1 step, ~1.25 ms is the staged
# assembly — point expand (0.22) + W/Y selector algebra (0.11) + Mosaic
# A-spread + Khatri-Rao FtF (0.70) + A'A einsum & reshapes (~0.2). The
# ops/pallas_kernels.schur_assembly kernel computes all of it per tile in
# VMEM: W, Y, the (B, te*C*tf) spread, and A itself never exist in HBM;
# the kernel's only outputs are S's Gram, the camera Grams, and the rhs
# weights. The evaluation emits TRANSPOSED GROUPED lanes (48, B) via
# vmap(out_axes=1) — (B, k<128) arrays are 128-lane padded in TPU HBM, so
# the lane-major layout also shrinks the LM iteration's J carry ~3x.
# ---------------------------------------------------------------------------

_GF, _GE = 16, 8  # 8-aligned group widths for (tc=9, tp=3) lanes


def _residual_and_grouped_row(cam, pt, ob):
    """(r (2,), Jg (48,)): grouped lanes [Jf_r0 | pad | Jf_r1 | pad |
    Je_r0 | pad | Je_r1 | pad] so kernel/XLA row algebra slices at
    8-aligned offsets."""
    def f(c, p):
        return snavely_reprojection_residual(c, p, ob)

    r = f(cam, pt)
    Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam, pt)
    z7 = jnp.zeros(7, Jc.dtype)
    z5 = jnp.zeros(5, Jc.dtype)
    Jg = jnp.concatenate(
        [Jc[0], z7, Jc[1], z7, Jp[0], z5, Jp[1], z5])
    return r, Jg


def _evaluate_grouped_T(cams, pts, cam_idx, obs_T, w, oh_gather, expand_p_T):
    """Transposed grouped evaluation: (r_T (2, B), Jg_T (48, B))."""
    camg_T = jnp.einsum("bc,ck->kb", oh_gather, cams, precision=_HI)
    pts_T = expand_p_T(pts)
    r_T, Jg_T = jax.vmap(_residual_and_grouped_row, in_axes=(1, 1, 1),
                         out_axes=1)(camg_T, pts_T, obs_T)
    if w is not None:
        r_T = r_T * w[None, :]
        Jg_T = Jg_T * w[None, :]
    return r_T, Jg_T


class AsmPlan(NamedTuple):
    """Static per-structure prep for the assembly pipeline."""

    row_ts: jax.Array  # (T+1,) row-balanced tile starts
    row_tb: jax.Array  # (T+1,) per-tile first point
    max_rows: int
    blk_ts: jax.Array  # plan_block_tiles starts (segment reductions)
    blk_max_rows: int
    ids_T: jax.Array  # (8, B + max_rows) pid row 0, cid row 1
    C_pad: int


def build_asm_plan(cam_idx, pt_idx, P, C) -> AsmPlan:
    import numpy as _np

    from ..ops import pallas_kernels as pk

    pt_np = _np.asarray(pt_idx)
    ts, tb, mr = pk.plan_row_tiles(pt_np, P + 1)
    bts, bmr = pk.plan_block_tiles(pt_np, P)
    n_pad = pt_np.shape[0] + mr
    pid_row = _np.concatenate(
        [pt_np.astype(_np.int32), _np.full((mr,), -1, _np.int32)])
    cid_row = _np.concatenate(
        [_np.asarray(cam_idx, _np.int32), _np.full((mr,), -1, _np.int32)])
    ids = _np.zeros((8, n_pad), _np.int32)
    ids[0] = pid_row
    ids[1] = cid_row
    C_pad = max(128, -(-(C + 1) // 128) * 128)
    return AsmPlan(jnp.asarray(ts), jnp.asarray(tb), mr,
                   jnp.asarray(bts), bmr, jnp.asarray(ids), C_pad)


def _schur_core_asm(Jg_T, r_T, radius, oh_gather, onehot, pt_idx,
                    plan: AsmPlan, C, P, rr=2, tc=9, tp=3,
                    interpret=False):
    """v1 _schur_core semantics via the one-kernel assembly."""
    from ..ops import pallas_kernels as pk

    dt = Jg_T.dtype
    gf, ge = _GF, _GE
    B = r_T.shape[1]
    off_e = rr * gf
    Jf_g = [Jg_T[i * gf:(i + 1) * gf] for i in range(rr)]
    Je_g = [Jg_T[off_e + i * ge: off_e + (i + 1) * ge] for i in range(rr)]
    ids32 = pt_idx.astype(jnp.int32)

    # fused point reduce: [Je'r (tp) | diag Je^2 (tp) | outer (tp*tp)]
    jtr_e = sum(Je_g[i] * r_T[i:i + 1] for i in range(rr))
    jsq_e = sum(Je_g[i] * Je_g[i] for i in range(rr))
    outer_e = jnp.concatenate([
        sum(Je_g[i][k:k + 1] * Je_g[i][:tp] for i in range(rr))
        for k in range(tp)], axis=0)  # (tp*tp, B)
    contrib_T = jnp.concatenate(
        [jtr_e[:tp], jsq_e[:tp], outer_e], axis=0)  # (2*tp+tp*tp, B)
    red = pk.segment_block_sum(
        None, ids32, plan.blk_ts, P, max_rows=plan.blk_max_rows,
        interpret=interpret, contrib_T=contrib_T)[:P]
    gp = red[:, :tp]
    d2p = red[:, tp:2 * tp]
    ete_u = red[:, 2 * tp:]

    # camera side (one-hot MXU over lanes)
    jtr_c = sum(Jf_g[i] * r_T[i:i + 1] for i in range(rr))  # (gf, B)
    jsq_c = sum(Jf_g[i] * Jf_g[i] for i in range(rr))
    gc = jnp.einsum("kb,bc->ck", jtr_c, onehot, precision=_HI)[:, :tc]
    d2c = jnp.einsum("kb,bc->ck", jsq_c, onehot, precision=_HI)[:, :tc]

    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    diag_c = jnp.clip(sc * sc * d2c, 1e-6, 1e32)
    diag_p = jnp.clip(sp * sp * d2p, 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius

    # per-point elimination lanes (f64 per PRECISE_POINT_SOLVES, as v1)
    sp_outer = _outer_flat(sp, sp, _outer_selectors(1, tp, tp, dt))
    diag_embed = np.zeros((tp, tp * tp))
    for i in range(tp):
        diag_embed[i, i * tp + i] = 1.0
    M_flat = ete_u * sp_outer + _mmf(D2p, jnp.asarray(diag_embed, dt))
    etb = sp * gp
    dt3 = jnp.float64 if PRECISE_POINT_SOLVES else dt
    L3 = _chol3_flat(M_flat.astype(dt3))
    Kf64 = _inv_lower3(L3)
    Kf = Kf64.astype(dt)
    u64 = jnp.stack(
        [sum(Kf64[:, i * tp + k] * etb[:, k].astype(dt3)
             for k in range(tp)) for i in range(tp)], axis=1)  # (P, tp)
    u_f = u64.astype(dt)

    # assembly kernel inputs
    BT = pk.BLOCKS_PER_TILE
    pw = jnp.zeros((P + 1 + BT, 128), dt)
    pw = jax.lax.dynamic_update_slice(pw, sp, (0, 0))
    pw = jax.lax.dynamic_update_slice(pw, Kf, (0, 8))
    pw = jax.lax.dynamic_update_slice(pw, u_f, (0, 24))
    sc_T = jnp.zeros((gf, plan.C_pad), dt)
    sc_T = jax.lax.dynamic_update_slice(sc_T, sc.T, (0, 0))
    JT = jnp.concatenate(
        [Jg_T, jnp.zeros((Jg_T.shape[0], plan.max_rows), dt)], axis=1)
    # VMEM-aware unroll: the per-tile T_i tensors are (max_rows, C*tc)
    # bf16 x 2 parts; keep the working set under ~6 MB
    t_full = C * tc
    per_tile = plan.max_rows * t_full * 2 * 2 + plan.max_rows * 48 * 4
    unroll = max(1, min(4, (2 << 20) // max(per_tile, 1)))
    ata, ftf, U = pk.schur_assembly(
        JT, plan.ids_T, sc_T, pw, plan.row_ts, plan.row_tb, P, C, rr, tc,
        tp, max_rows=plan.max_rows, unroll=unroll, interpret=interpret)

    ftf_blocks = ftf[:C].reshape(C, tc, gf)[:, :, :tc]
    S = jnp.einsum("cij,cd->cidj", ftf_blocks,
                   jnp.eye(C, dtype=dt)).reshape(t_full, t_full)
    S = S - ata + jnp.diag(D2c.reshape(-1))
    ftb = (sc * gc).reshape(-1)
    rhs = ftb - U[0]

    dtS = jnp.float64 if PRECISE_SCHUR_SOLVE else dt
    Ls = jnp.linalg.cholesky(S.astype(dtS))
    if dtS == jnp.float32:
        from ..solvers.linear.dense import tri_inverse_lower

        Linv = tri_inverse_lower(Ls)
        z = (Linv.T @ (Linv @ rhs.astype(dtS))).astype(dt)
    else:
        z = jax.scipy.linalg.cho_solve((Ls, True), rhs.astype(dtS)).astype(dt)

    # back substitution via the implicit identity A_p z = Kf_p (E_s'F_s z)_p
    zc_s = sc * z.reshape(C, tc)
    zg9 = jnp.einsum("bc,ck->kb", oh_gather, zc_s, precision=_HI)  # (tc, B)
    zg = jnp.concatenate([zg9, jnp.zeros((gf - tc, B), dt)], axis=0)
    fz = [jnp.sum(Jf_g[i] * zg, axis=0, keepdims=True) for i in range(rr)]
    contrib_bz = jnp.concatenate([
        sum(Je_g[i][k:k + 1] * fz[i] for i in range(rr))
        for k in range(tp)], axis=0)  # (tp, B)
    etfz = sp * pk.segment_block_sum(
        None, ids32, plan.blk_ts, P, max_rows=plan.blk_max_rows,
        interpret=interpret, contrib_T=contrib_bz)[:P, :tp]
    Az64 = jnp.stack(
        [sum(Kf64[:, i * tp + k] * etfz[:, k].astype(dt3)
             for k in range(tp)) for i in range(tp)], axis=1)
    y_p = _solve_lower3_t(L3, u64 - Az64).astype(dt)

    step_c = -z.reshape(C, tc)
    step_p = -y_p
    g_dot = jnp.sum((sc * gc) * step_c) + jnp.sum((sp * gp) * step_p)
    d2_dot = jnp.sum(D2c * step_c * step_c) + jnp.sum(D2p * step_p * step_p)
    model_cost_change = -0.5 * g_dot + 0.5 * d2_dot
    return step_c, step_p, sc, sp, model_cost_change


class SchurCarryT(NamedTuple):
    """BAState + cached transposed evaluation (see SchurCarry)."""

    cams: jax.Array
    pts: jax.Array
    radius: jax.Array
    cost: jax.Array
    r_T: jax.Array
    Jg_T: jax.Array


def _asm_env(cams, pts, cam_idx, pt_idx, plan, interpret=False):
    from ..ops import pallas_kernels as pk

    C = cams.shape[0]
    oh_gather = jax.nn.one_hot(cam_idx, C, dtype=cams.dtype)
    ids32 = pt_idx.astype(jnp.int32)
    B = int(cam_idx.shape[0])

    def expand_p_T(vals):
        return pk.segment_block_expand(
            vals, ids32, plan.blk_ts, B, max_rows=plan.blk_max_rows,
            interpret=interpret, transposed_out=True)

    return oh_gather, expand_p_T


def lm_step_schur_v2_init(cams, pts, cam_idx, pt_idx, obs_T, radius,
                          plan: AsmPlan, interpret=False) -> SchurCarryT:
    oh_gather, expand_p_T = _asm_env(cams, pts, cam_idx, pt_idx, plan,
                                     interpret)
    r_T, Jg_T = _evaluate_grouped_T(cams, pts, cam_idx, obs_T, None,
                                    oh_gather, expand_p_T)
    return SchurCarryT(cams, pts, radius, 0.5 * jnp.sum(r_T * r_T), r_T,
                       Jg_T)


def lm_step_schur_v2_next(carry: SchurCarryT, cam_idx, pt_idx, obs_T,
                          plan: AsmPlan, interpret=False) -> SchurCarryT:
    cams, pts, radius, cost, r_T, Jg_T = carry
    C, P = cams.shape[0], pts.shape[0]
    oh_gather, expand_p_T = _asm_env(cams, pts, cam_idx, pt_idx, plan,
                                     interpret)
    step_c, step_p, sc, sp, mcc = _schur_core_asm(
        Jg_T, r_T, radius, oh_gather, oh_gather, pt_idx, plan, C, P,
        interpret=interpret)
    new_cams = cams + step_c * sc
    new_pts = pts + step_p * sp
    r_new, Jg_new = _evaluate_grouped_T(new_cams, new_pts, cam_idx, obs_T,
                                        None, oh_gather, expand_p_T)
    new_cost = 0.5 * jnp.sum(r_new * r_new)
    ok = jnp.isfinite(new_cost) & (mcc > 0)
    rel = (cost - new_cost) / jnp.maximum(mcc, 1e-300)
    accept = ok & (rel > 1e-3)
    radius_out = jnp.where(
        accept,
        jnp.minimum(
            radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rel - 1.0) ** 3),
            1e16),
        radius / 2.0)
    return SchurCarryT(
        jnp.where(accept, new_cams, cams),
        jnp.where(accept, new_pts, pts),
        radius_out,
        jnp.where(accept, new_cost, cost),
        jnp.where(accept, r_new, r_T),
        jnp.where(accept, Jg_new, Jg_T),
    )


def lm_step_schur_v2_k(cams, pts, cam_idx, pt_idx, obs_T, radius,
                       plan: AsmPlan, k=5, interpret=False):
    """k LM iterations via the one-kernel assembly pipeline (see
    lm_step_schur_k)."""
    carry = lm_step_schur_v2_init(cams, pts, cam_idx, pt_idx, obs_T, radius,
                                  plan, interpret)

    def body(_, cr):
        return lm_step_schur_v2_next(cr, cam_idx, pt_idx, obs_T, plan,
                                     interpret)

    out = jax.lax.fori_loop(0, k, body, carry)
    return BAState(out.cams, out.pts, out.radius, out.cost)


def make_sharded_lm_step(mesh: Mesh, cg_iters: int = 10, step: str = "cg"):
    """jit an LM step with observation arrays sharded over the mesh and the
    parameter state replicated; GSPMD inserts the ICI all-reduces.

    step="schur" shards the exact dense-Schur step: all per-observation
    work (Jacobian blocks, selector matmuls, the (B, 3*9C) element
    contributions) stays shard-local; the point segment-sums and the
    camera one-hot matmuls reduce to replicated outputs via psum, and the
    tiny 9C x 9C solve runs replicated."""
    obs_sharded = NamedSharding(mesh, P("obs"))
    obs_sharded2 = NamedSharding(mesh, P("obs", None))
    repl = NamedSharding(mesh, P())

    if step == "schur":
        fn = lm_step_schur
    else:
        fn = functools.partial(lm_step, cg_iters=cg_iters)
    return jax.jit(
        fn,
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
             dtype=jnp.float64, step="auto"):
    """Run `num_iterations` LM steps on a BALProblem; returns final BAState.

    step: "schur" = exact dense-Schur elimination per step (lm_step_schur;
    best when 9*num_cameras is dense-solvable), "cg" = matrix-free PCG
    (lm_step), "auto" picks schur for <= 128 cameras. With a mesh,
    observations are sharded across devices (cg path)."""
    cams = jnp.asarray(bal_problem.cameras, dtype)
    pts = jnp.asarray(bal_problem.points, dtype)
    if mesh is not None:
        n_dev = mesh.devices.size
        cam_idx, w = _pad_to_multiple(bal_problem.camera_index, n_dev)
        pt_idx, _ = _pad_to_multiple(bal_problem.point_index, n_dev)
        obs, _ = _pad_to_multiple(bal_problem.observations, n_dev)
        use_schur = step == "schur" or (
            step == "auto" and bal_problem.cameras.shape[0] <= 128
        )
        step_fn = make_sharded_lm_step(
            mesh, cg_iters, step="schur" if use_schur else "cg"
        )
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
        if step == "schur" or (step == "auto" and bal_problem.cameras.shape[0] <= 128):
            step_fn = jax.jit(
                lambda c, p_, cidx, pidx, o, r, w=None: lm_step_schur(
                    c, p_, cidx, pidx, o, r, w
                )
            )
        else:
            step_fn = jax.jit(functools.partial(lm_step, cg_iters=cg_iters))
    radius = jnp.asarray(1e4, dtype)
    state = BAState(cams, pts, radius, jnp.asarray(0.0, dtype))
    for _ in range(num_iterations):
        state = BAState(
            *step_fn(state.cams, state.pts, cam_idx, pt_idx, obs, state.radius, w)
        )
    return jax.block_until_ready(state)


# ---------------------------------------------------------------------------
# Point-sharded model parallelism (SURVEY §5.7): the POINT state is
# block-row partitioned over the mesh — each device owns a contiguous
# slice of points plus exactly the observations of those points (rows are
# sorted by point, so co-locating observations with their point shard is a
# contiguous split, no halo needed on the e-side). The camera state is
# replicated (9C is tiny next to 3P); camera-side aggregates close over
# the mesh with one psum each inside _schur_core. This removes the
# replicated-state memory wall: per-device point arrays are P/n, matching
# the reference's partitioned row access (partitioned_matrix_view_impl.h)
# re-expressed as GSPMD sharding.
# ---------------------------------------------------------------------------


class PointShardPlan(NamedTuple):
    """Host-side layout for the point-sharded LM step (all numpy)."""

    pts: np.ndarray       # (n*Pl, 3) padded point table, shard-major
    cam_idx: np.ndarray   # (n*Bl,) int32 global camera ids
    pt_local: np.ndarray  # (n*Bl,) int32 LOCAL point id within the shard
    obs: np.ndarray       # (n*Bl, 2)
    w: np.ndarray         # (n*Bl,) validity weights (0 on padding rows)
    point_slot: np.ndarray  # (P,) padded-slot index of each original point
    Pl: int               # points per shard (padded)
    Bl: int               # observations per shard (padded)
    n: int


def plan_point_sharding(camera_index, point_index, points, observations,
                        n: int) -> PointShardPlan:
    """Partition points into n contiguous slices with ~equal observation
    counts; pad each shard's points/rows to the max so shapes are static
    and mesh-divisible. Padding rows replicate a real observation with
    weight 0 (finite values — 0*NaN would survive the mask)."""
    cam_idx = np.asarray(camera_index)
    pt_idx = np.asarray(point_index)
    pts = np.asarray(points)
    obs = np.asarray(observations)
    P = pts.shape[0]
    B = cam_idx.shape[0]
    order = np.argsort(pt_idx, kind="stable")
    cam_idx, pt_idx, obs = cam_idx[order], pt_idx[order], obs[order]
    counts = np.bincount(pt_idx, minlength=P)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    # shard boundaries in point space at ~equal observation quantiles
    bounds = [0]
    for i in range(1, n):
        target = i * B / n
        p = int(np.searchsorted(offsets, target, side="left"))
        bounds.append(min(max(p, bounds[-1]), P))
    bounds.append(P)
    Pl = max(bounds[i + 1] - bounds[i] for i in range(n))
    Pl = max(Pl, 1)
    Bl = max(
        int(offsets[bounds[i + 1]] - offsets[bounds[i]]) for i in range(n))
    Bl = max(Bl, 1)
    pts_pad = np.zeros((n * Pl, pts.shape[1]), pts.dtype)
    cam_pad = np.zeros(n * Bl, cam_idx.dtype)
    ptl_pad = np.zeros(n * Bl, np.int32)
    obs_pad = np.zeros((n * Bl, obs.shape[1]), obs.dtype)
    w_pad = np.zeros(n * Bl, pts.dtype)
    point_slot = np.zeros(P, np.int64)
    for i in range(n):
        p0, p1 = bounds[i], bounds[i + 1]
        r0, r1 = int(offsets[p0]), int(offsets[p1])
        np_i, nb_i = p1 - p0, r1 - r0
        pts_pad[i * Pl: i * Pl + np_i] = pts[p0:p1]
        if np_i < Pl:  # padded points: finite dummies (copy of first row)
            pts_pad[i * Pl + np_i: (i + 1) * Pl] = pts[p0] if np_i else 1.0
        point_slot[p0:p1] = np.arange(i * Pl, i * Pl + np_i)
        sl = slice(i * Bl, i * Bl + nb_i)
        cam_pad[sl] = cam_idx[r0:r1]
        ptl_pad[sl] = (pt_idx[r0:r1] - p0).astype(np.int32)
        obs_pad[sl] = obs[r0:r1]
        w_pad[sl] = 1.0
        if nb_i < Bl and nb_i:  # replicate last real row, weight 0
            cam_pad[i * Bl + nb_i: (i + 1) * Bl] = cam_idx[r1 - 1]
            ptl_pad[i * Bl + nb_i: (i + 1) * Bl] = pt_idx[r1 - 1] - p0
            obs_pad[i * Bl + nb_i: (i + 1) * Bl] = obs[r1 - 1]
    return PointShardPlan(pts_pad, cam_pad, ptl_pad, obs_pad, w_pad,
                          point_slot, Pl, Bl, n)


def make_point_sharded_step(mesh: Mesh, k: int = 1, axis: str = "pt"):
    """shard_map'd k-iteration LM step over a point-sharded layout.

    Returns step(cams, pts_sh, cam_idx_sh, pt_local_sh, obs_sh, w_sh,
    radius) -> BAState where pts stays partitioned over `axis` (assert
    via .addressable_shards) and cams/radius/cost are replicated."""
    from jax import shard_map

    def body(cams, pts_l, cam_idx_l, pt_l, obs_l, w_l, radius):
        st = lm_step_schur_k(cams, pts_l, cam_idx_l, pt_l, obs_l, radius,
                             k=k, w=w_l, axis_name=axis)
        return st.cams, st.pts, st.radius, st.cost

    sh = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis, None), P(axis),
                  P()),
        out_specs=(P(), P(axis), P(), P()),
    )

    def step(cams, pts_sh, cam_idx_sh, pt_local_sh, obs_sh, w_sh, radius):
        c, p, r, co = sh(cams, pts_sh, cam_idx_sh, pt_local_sh, obs_sh,
                         w_sh, radius)
        return BAState(c, p, r, co)

    return jax.jit(step)


def solve_ba_point_sharded(b, num_iterations=10, mesh=None, k=None,
                           radius0=1e4, axis: str = "pt"):
    """End-to-end point-sharded LM on a BALProblem-like `b`. Returns
    (BAState with pts in the PADDED shard layout, PointShardPlan)."""
    mesh = mesh or make_mesh(axis=axis)
    n = mesh.devices.size
    plan = plan_point_sharding(b.camera_index, b.point_index, b.points,
                               b.observations, n)
    sh = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    cams = jax.device_put(jnp.asarray(b.cameras), repl)
    pts = jax.device_put(jnp.asarray(plan.pts), sh2)
    cam_idx = jax.device_put(jnp.asarray(plan.cam_idx), sh)
    pt_local = jax.device_put(jnp.asarray(plan.pt_local), sh)
    obs = jax.device_put(jnp.asarray(plan.obs), sh2)
    w = jax.device_put(jnp.asarray(plan.w), sh)
    k = k or num_iterations
    step = make_point_sharded_step(mesh, k=k, axis=axis)
    st = BAState(cams, pts, jnp.asarray(radius0, cams.dtype),
                 jnp.asarray(0.0, cams.dtype))
    done = 0
    while done < num_iterations:
        st = step(st.cams, st.pts, cam_idx, pt_local, obs, w, st.radius)
        done += k
    return st, plan


# ---------------------------------------------------------------------------
# Camera-dimension state sharding (SURVEY §5.7: shard BOTH e- and f-block
# rows). The camera table AND the point table are persistently partitioned
# over the mesh — the configuration where neither state axis fits one chip
# (partitioned_matrix_view.h:66 + block_structure.h:86-91 nnz-balanced
# partitioning, re-imagined as static shard layouts). Observations live
# with their camera's owner shard, so every camera-side reduction is
# DEVICE-LOCAL (no halo at all on the f side); the point side crosses
# shards through ONE all-gather of the (small) point table per iteration
# plus ONE psum per point-side reduction — the all-gather-halo /
# reduce-scatter pairing of SURVEY §5.7, in its dense-collective form.
# Transient CG point vectors are replicated (P*tp floats — bytes per
# point, vs. the camera table's dominance in the large-C regime this
# layout targets).
# ---------------------------------------------------------------------------


class CameraShardPlan(NamedTuple):
    """Host-side layout for the fully-sharded (camera + point) LM step."""

    cams: np.ndarray      # (n*Cl, 9) padded camera table, shard-major
    pts: np.ndarray       # (n*Pl, 3) padded point table, shard-major
    cam_local: np.ndarray  # (n*Bl,) int32 LOCAL camera id within the shard
    pt_slot: np.ndarray   # (n*Bl,) int32 PADDED-TABLE point slot (global)
    obs: np.ndarray       # (n*Bl, 2)
    w: np.ndarray         # (n*Bl,) validity weights (0 on padding rows)
    camera_slot: np.ndarray  # (C,) padded-slot index of each original camera
    point_slot: np.ndarray   # (P,) padded-slot index of each original point
    Cl: int               # cameras per shard (padded)
    Pl: int               # points per shard (padded)
    Bl: int               # observations per shard (padded)
    n: int


def plan_camera_sharding(camera_index, point_index, cameras, points,
                         observations, n: int) -> CameraShardPlan:
    """Partition cameras into n contiguous slices with ~equal observation
    counts (observations follow their camera), and points into n equal
    slices; pad both tables and the per-shard rows to static,
    mesh-divisible shapes. Padding rows replicate a real observation with
    weight 0."""
    cam_idx = np.asarray(camera_index)
    pt_idx = np.asarray(point_index)
    cams = np.asarray(cameras)
    pts = np.asarray(points)
    obs = np.asarray(observations)
    C, P, B = cams.shape[0], pts.shape[0], cam_idx.shape[0]

    # point table: n equal contiguous slices, padded to Pl
    Pl = -(-P // n)
    pts_pad = np.zeros((n * Pl, pts.shape[1]), pts.dtype)
    point_slot = np.zeros(P, np.int64)
    for i in range(n):
        p0, p1 = i * Pl, min((i + 1) * Pl, P)
        np_i = p1 - p0
        if np_i > 0:
            pts_pad[i * Pl: i * Pl + np_i] = pts[p0:p1]
            point_slot[p0:p1] = np.arange(i * Pl, i * Pl + np_i)
        if np_i < Pl:  # finite dummies
            pts_pad[i * Pl + np_i: (i + 1) * Pl] = pts[p0] if np_i else 1.0

    # camera boundaries at ~equal observation quantiles
    order = np.argsort(cam_idx, kind="stable")
    cam_s, pt_s, obs_s = cam_idx[order], pt_idx[order], obs[order]
    counts = np.bincount(cam_s, minlength=C)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    bounds = [0]
    for i in range(1, n):
        target = i * B / n
        c = int(np.searchsorted(offsets, target, side="left"))
        bounds.append(min(max(c, bounds[-1]), C))
    bounds.append(C)
    Cl = max(max(bounds[i + 1] - bounds[i] for i in range(n)), 1)
    Bl = max(max(int(offsets[bounds[i + 1]] - offsets[bounds[i]])
                 for i in range(n)), 1)

    cams_pad = np.zeros((n * Cl, cams.shape[1]), cams.dtype)
    caml_pad = np.zeros(n * Bl, np.int32)
    pslot_pad = np.zeros(n * Bl, np.int32)
    obs_pad = np.zeros((n * Bl, obs.shape[1]), obs.dtype)
    w_pad = np.zeros(n * Bl, pts.dtype)
    camera_slot = np.zeros(C, np.int64)
    for i in range(n):
        c0, c1 = bounds[i], bounds[i + 1]
        r0, r1 = int(offsets[c0]), int(offsets[c1])
        nc_i, nb_i = c1 - c0, r1 - r0
        if nc_i > 0:
            cams_pad[i * Cl: i * Cl + nc_i] = cams[c0:c1]
            camera_slot[c0:c1] = np.arange(i * Cl, i * Cl + nc_i)
        if nc_i < Cl:
            cams_pad[i * Cl + nc_i: (i + 1) * Cl] = cams[c0] if nc_i else 1.0
        sl = slice(i * Bl, i * Bl + nb_i)
        caml_pad[sl] = (cam_s[r0:r1] - c0).astype(np.int32)
        pslot_pad[sl] = point_slot[pt_s[r0:r1]].astype(np.int32)
        obs_pad[sl] = obs_s[r0:r1]
        w_pad[sl] = 1.0
        if nb_i < Bl and nb_i:
            caml_pad[i * Bl + nb_i: (i + 1) * Bl] = cam_s[r1 - 1] - c0
            pslot_pad[i * Bl + nb_i: (i + 1) * Bl] = point_slot[pt_s[r1 - 1]]
            obs_pad[i * Bl + nb_i: (i + 1) * Bl] = obs_s[r1 - 1]
    return CameraShardPlan(cams_pad, pts_pad, caml_pad, pslot_pad, obs_pad,
                           w_pad, camera_slot, point_slot, Cl, Pl, Bl, n)


def lm_step_camera_sharded(cams_l, pts_l, cam_local, pt_slot, obs, radius,
                           axis_name, w=None, cg_iters: int = 10):
    """One LM iteration with the CAMERA table device-local and the POINT
    table persistently sharded (gathered once per iteration). CG on the
    scaled normal equations (lm_step's math), with:

     - camera-side reductions shard-local (observations live with their
       camera's owner — the zero-halo property of this layout);
     - point-side reductions closed with one psum each (replicated
       transients);
     - scalar CG/accept decisions psummed over camera parts, computed
       replicated on point parts.

    Returns (new cams_l, new pts_l, radius, cost) — both state tables
    still sharded."""
    n_idx = jax.lax.axis_index(axis_name)
    Pl = pts_l.shape[0]
    pts = jax.lax.all_gather(pts_l, axis_name, axis=0, tiled=True)

    def psum(x):
        return jax.lax.psum(x, axis_name)

    r, Jc, Jp = _evaluate(cams_l, pts, cam_local, pt_slot, obs, w)
    cost = psum(0.5 * jnp.sum(r * r))
    C_l = cams_l.shape[0]
    P_pad = pts.shape[0]
    reduce_c, reduce_p0 = _make_reducers(cam_local, pt_slot, C_l, P_pad, None)
    reduce_p = lambda contrib: psum(reduce_p0(contrib))

    B, rr, tc = Jc.shape
    tp = Jp.shape[2]
    R, S = _flat_selectors(rr, tc, tp, Jc.dtype)
    J = jnp.concatenate(
        [Jc.reshape(B, rr * tc), Jp.reshape(B, rr * tp)], axis=1)

    def split(ct_pt):
        return ct_pt[:, :tc], ct_pt[:, tc:]

    jtr = _mmf(J * _mmf(r, S.T), R.T)
    jsq = _mmf(J * J, R.T)
    gcb, gpb = split(jtr)
    d2cb, d2pb = split(jsq)
    gc = reduce_c(gcb)          # local camera rows — no psum
    gp = reduce_p(gpb)          # replicated point rows
    d2c = reduce_c(d2cb)
    d2p = reduce_p(d2pb)
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    Js = J * _mmf(jnp.concatenate([sc[cam_local], sp[pt_slot]], axis=1), R)
    diag_c = jnp.clip(sc * sc * d2c, 1e-6, 1e32)
    diag_p = jnp.clip(sp * sp * d2p, 1e-6, 1e32)
    D2c = diag_c / radius
    D2p = diag_p / radius
    rhs_c = sc * gc
    rhs_p = sp * gp
    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def matvec(vc, vp):
        seg = jnp.concatenate([vc[cam_local], vp[pt_slot]], axis=1)
        jv = _mmf(Js * _mmf(seg, R), S)
        back = _mmf(Js * _mmf(jv, S.T), R.T)
        cb, pb = split(back)
        return reduce_c(cb) + D2c * vc, reduce_p(pb) + D2p * vp

    def dots(ac, bc, ap, bp):
        return psum(jnp.sum(ac * bc)) + jnp.sum(ap * bp)

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = matvec(pc, pp)
        pq = dots(pc, qc, pp, qp)
        alpha = rz / jnp.maximum(pq, 1e-300)
        xc = xc + alpha * pc
        xp = xp + alpha * pp
        rc = rc - alpha * qc
        rp = rp - alpha * qp
        zc = Minv_c * rc
        zp = Minv_p * rp
        rz_new = dots(rc, zc, rp, zp)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        pc = zc + beta * pc
        pp = zp + beta * pp
        return xc, xp, rc, rp, pc, pp, rz_new

    zc0 = Minv_c * rhs_c
    zp0 = Minv_p * rhs_p
    rz0 = dots(rhs_c, zc0, rhs_p, zp0)
    init = (jnp.zeros_like(cams_l), jnp.zeros_like(pts), rhs_c, rhs_p,
            zc0, zp0, rz0)
    yc, yp, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    step_c, step_p = -yc, -yp

    segs_step = jnp.concatenate(
        [step_c[cam_local], step_p[pt_slot]], axis=1)
    jstep = _mmf(Js * _mmf(segs_step, R), S)
    model_cost_change = psum(-jnp.sum(jstep * (r + jstep / 2.0)))

    new_cams = cams_l + step_c * sc
    new_pts = pts + step_p * sp
    new_cost = psum(ba_cost(new_cams, new_pts, cam_local, pt_slot, obs, w))
    rel_decrease = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = (model_cost_change > 0) & (rel_decrease > 1e-3)

    cams_out = jnp.where(accept, new_cams, cams_l)
    pts_full_out = jnp.where(accept, new_pts, pts)
    radius_out = jnp.where(
        accept,
        jnp.minimum(
            radius / jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rel_decrease - 1.0) ** 3),
            1e16,
        ),
        radius / 2.0,
    )
    cost_out = jnp.where(accept, new_cost, cost)
    # persist only this shard's point slice
    start = (n_idx * Pl).astype(jnp.int32)
    pts_l_out = jax.lax.dynamic_slice(
        pts_full_out, (start, jnp.asarray(0, jnp.int32)),
        (Pl, pts_full_out.shape[1]))
    return cams_out, pts_l_out, radius_out, cost_out


def make_camera_sharded_step(mesh: Mesh, k: int = 1, axis: str = "cam",
                             cg_iters: int = 10):
    """shard_map'd k-iteration fully-sharded LM step. Returns
    step(cams_sh, pts_sh, cam_local_sh, pt_slot_sh, obs_sh, w_sh, radius)
    -> BAState with BOTH cams and pts still partitioned over `axis`."""
    from jax import shard_map

    def body(cams_l, pts_l, cam_local, pt_slot, obs_l, w_l, radius):
        def it(_, st):
            c, p, rad, co = st
            return lm_step_camera_sharded(
                c, p, cam_local, pt_slot, obs_l, rad, axis,
                w=w_l, cg_iters=cg_iters)
        c, p, rad, co = jax.lax.fori_loop(
            0, k, it, (cams_l, pts_l, radius, jnp.asarray(0.0, radius.dtype)))
        return c, p, rad, co

    sh = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                  P(axis, None), P(axis), P()),
        out_specs=(P(axis, None), P(axis, None), P(), P()),
    )

    def step(cams_sh, pts_sh, cam_local_sh, pt_slot_sh, obs_sh, w_sh,
             radius):
        c, p, r, co = sh(cams_sh, pts_sh, cam_local_sh, pt_slot_sh, obs_sh,
                         w_sh, radius)
        return BAState(c, p, r, co)

    return jax.jit(step)


def solve_ba_camera_sharded(b, num_iterations=10, mesh=None, k=None,
                            radius0=1e4, axis: str = "cam",
                            cg_iters: int = 10, halo: "bool | str" = "auto"):
    """End-to-end fully-sharded (camera + point tables partitioned) LM on
    a BALProblem-like `b`. Returns (BAState in the PADDED shard layouts,
    plan). `halo` selects the point-side closure:

     - True: visibility-cut halo exchange (plan_camera_halo) — every
       point-side collective is cut-sized; per-device working set
       O(P/n + cut). The scaling tier for problems where BOTH state
       axes exceed one chip (SURVEY §5.7).
     - False: dense one-all-gather layout (plan_camera_sharding) —
       better when the visibility cut approaches P (dense BAL-style
       random visibility), where halo lists would replicate the table
       anyway with extra index traffic.
     - "auto": halo iff the total halo volume is under half of the
       replicated-table volume."""
    mesh = mesh or make_mesh(axis=axis)
    n = mesh.devices.size
    if halo == "auto" or halo is True:
        hplan = plan_camera_halo(b.camera_index, b.point_index, b.cameras,
                                 b.points, b.observations, n)
        # per-device halo rows (n*Hs) vs per-device replicated table
        # (n*Pl): below half, the cut layout wins
        if halo == "auto" and n * hplan.Hs > hplan.pts.shape[0] // 2:
            hplan = None  # cut ~ P: dense all-gather moves less
    else:
        hplan = None
    sh = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    if hplan is not None:
        plan = hplan
        cams = jax.device_put(jnp.asarray(plan.cams), sh2)
        pts = jax.device_put(jnp.asarray(plan.pts), sh2)
        cam_local = jax.device_put(jnp.asarray(plan.cam_local), sh)
        pt_ref = jax.device_put(jnp.asarray(plan.pt_halo), sh)
        srv = jax.device_put(jnp.asarray(plan.srv_idx),
                             NamedSharding(mesh, P(axis, None, None)))
        obs = jax.device_put(jnp.asarray(plan.obs), sh2)
        w = jax.device_put(jnp.asarray(plan.w), sh)
        k = k or num_iterations
        step = make_camera_halo_step(mesh, k=k, axis=axis,
                                     cg_iters=cg_iters)
        st = BAState(cams, pts, jnp.asarray(radius0, cams.dtype),
                     jnp.asarray(0.0, cams.dtype))
        done = 0
        while done < num_iterations:
            st = step(st.cams, st.pts, cam_local, pt_ref, obs, w, srv,
                      st.radius)
            done += k
        return st, plan
    plan = plan_camera_sharding(b.camera_index, b.point_index, b.cameras,
                                b.points, b.observations, n)
    cams = jax.device_put(jnp.asarray(plan.cams), sh2)
    pts = jax.device_put(jnp.asarray(plan.pts), sh2)
    cam_local = jax.device_put(jnp.asarray(plan.cam_local), sh)
    pt_slot = jax.device_put(jnp.asarray(plan.pt_slot), sh)
    obs = jax.device_put(jnp.asarray(plan.obs), sh2)
    w = jax.device_put(jnp.asarray(plan.w), sh)
    k = k or num_iterations
    step = make_camera_sharded_step(mesh, k=k, axis=axis,
                                    cg_iters=cg_iters)
    st = BAState(cams, pts, jnp.asarray(radius0, cams.dtype),
                 jnp.asarray(0.0, cams.dtype))
    done = 0
    while done < num_iterations:
        st = step(st.cams, st.pts, cam_local, pt_slot, obs, w, st.radius)
        done += k
    return st, plan


# ---------------------------------------------------------------------------
# Visibility-cut halo exchange (VERDICT r3 #1 "halo-exchange sharding";
# SURVEY §5.7-5.8 prescription; reference analog: nnz-balanced
# partitioning + partitioned views, partitioned_matrix_view.h:66,
# block_structure.h:86-91). The dense camera-sharded layout above
# replicates the WHOLE point table per device per iteration and psums
# full-P transients inside every CG iteration; here each shard exchanges
# only the point segments its observations touch (the visibility CUT —
# power-law visibility makes cut << P):
#
#  - plan_camera_halo builds, per (requester i, owner j) pair, the sorted
#    list of j-local point rows i needs, padded to the static max Hs;
#    observations address points by HALO-LOCAL index (j*Hs + k).
#  - forward exchange (_halo_fwd): each owner serves the rows each
#    requester asked for — ONE tiled all-to-all of (n*Hs, d).
#  - reverse exchange (_halo_rev): halo-space contributions return to
#    their owners through the same lists and scatter-add into the owned
#    slice — point reductions close in CUT space; no P-sized array ever
#    crosses the ICI, and no device materializes the full point table.
# ---------------------------------------------------------------------------


class CameraHaloPlan(NamedTuple):
    """Host-side layout for the halo-exchange fully-sharded LM step."""

    cams: np.ndarray      # (n*Cl, 9) padded camera table, shard-major
    pts: np.ndarray       # (n*Pl, 3) padded point table, shard-major
    cam_local: np.ndarray  # (n*Bl,) int32 LOCAL camera id within the shard
    pt_halo: np.ndarray   # (n*Bl,) int32 HALO-LOCAL point index (j*Hs+k)
    obs: np.ndarray       # (n*Bl, 2)
    w: np.ndarray         # (n*Bl,) validity weights (0 on padding rows)
    srv_idx: np.ndarray   # (n, n, Hs) int32: srv_idx[j, i] = j-local rows
    #                       shard j serves to requester i (0-padded)
    camera_slot: np.ndarray  # (C,) padded-slot index of each original camera
    point_slot: np.ndarray   # (P,) padded-slot index of each original point
    Cl: int
    Pl: int
    Bl: int
    Hs: int               # max halo rows requested from any single owner
    n: int


def plan_camera_halo(camera_index, point_index, cameras, points,
                     observations, n: int) -> CameraHaloPlan:
    """plan_camera_sharding + per-shard visibility-cut halo lists."""
    base = plan_camera_sharding(camera_index, point_index, cameras, points,
                                observations, n)
    Pl, Bl = base.Pl, base.Bl
    slot = np.asarray(base.pt_slot)
    reqs = []  # reqs[i][j] = sorted unique j-local rows shard i needs
    Hs = 1
    for i in range(n):
        u = np.unique(slot[i * Bl: (i + 1) * Bl])
        owner = u // Pl
        per = [np.ascontiguousarray((u[owner == j] % Pl).astype(np.int32))
               for j in range(n)]
        Hs = max(Hs, max(p.shape[0] for p in per))
        reqs.append(per)
    srv = np.zeros((n, n, Hs), np.int32)
    for i in range(n):
        for j in range(n):
            srv[j, i, : reqs[i][j].shape[0]] = reqs[i][j]
    # observation point references -> halo-local ids
    pt_halo = np.zeros(n * Bl, np.int32)
    for i in range(n):
        sl = slice(i * Bl, (i + 1) * Bl)
        s = slot[sl]
        j = s // Pl
        loc = (s % Pl).astype(np.int32)
        k = np.empty(s.shape[0], np.int32)
        for jj in range(n):
            m = j == jj
            if m.any():
                k[m] = np.searchsorted(reqs[i][jj], loc[m]).astype(np.int32)
        pt_halo[sl] = (j * Hs + k).astype(np.int32)
    return CameraHaloPlan(base.cams, base.pts, base.cam_local, pt_halo,
                          base.obs, base.w, srv, base.camera_slot,
                          base.point_slot, base.Cl, Pl, Bl, Hs, n)


def _halo_fwd(v_own, srv_l, axis):
    """Serve owned rows to every requester: v_own (Pl, d), srv_l (n, Hs)
    j-local rows to send to each destination. Returns this shard's halo
    table (n*Hs, d) — chunk j holds the rows it requested from shard j,
    in its own (sorted) request order."""
    send = v_own[srv_l.reshape(-1)]
    return jax.lax.all_to_all(send, axis, 0, 0, tiled=True)


def _halo_rev(contrib_halo, srv_l, axis, Pl):
    """Adjoint of _halo_fwd: return halo-space contributions (n*Hs, d)
    to their owners and scatter-add into the owned slice (Pl, d)."""
    back = jax.lax.all_to_all(contrib_halo, axis, 0, 0, tiled=True)
    return jnp.zeros((Pl, contrib_halo.shape[1]), contrib_halo.dtype).at[
        srv_l.reshape(-1)].add(back)


def _halo_linearize(cams_l, pts_own, cam_local, pt_halo, obs, srv_l,
                    radius, axis_name, w=None,
                    min_diag: float = 1e-6, max_diag: float = 1e32,
                    evaluate=None):
    """Shared halo-tier linearization: evaluate, reduce gradients/column
    norms through cut-sized exchanges, build the Jacobi-scaled damped
    normal-equations operator. Used by both the fixed-rule LM step and
    the Ceres-semantics step (identical op order — the 1e-10 parity
    tests pin the former)."""
    Pl = pts_own.shape[0]
    n = srv_l.shape[0]
    Hs = srv_l.shape[1]
    Hl = n * Hs

    def psum(x):
        return jax.lax.psum(x, axis_name)

    halo_pts = _halo_fwd(pts_own, srv_l, axis_name)
    if evaluate is None:
        evaluate = _evaluate
    r, Jc, Jp = evaluate(cams_l, halo_pts, cam_local, pt_halo, obs, w)
    cost = psum(0.5 * jnp.sum(r * r))
    C_l = cams_l.shape[0]
    reduce_c, reduce_h = _make_reducers(cam_local, pt_halo, C_l, Hl, None)

    def reduce_p(contrib):
        return _halo_rev(reduce_h(contrib), srv_l, axis_name, Pl)

    B, rr, tc = Jc.shape
    tp = Jp.shape[2]
    R, S = _flat_selectors(rr, tc, tp, Jc.dtype)
    J = jnp.concatenate(
        [Jc.reshape(B, rr * tc), Jp.reshape(B, rr * tp)], axis=1)

    def split(ct_pt):
        return ct_pt[:, :tc], ct_pt[:, tc:]

    jtr = _mmf(J * _mmf(r, S.T), R.T)
    jsq = _mmf(J * J, R.T)
    gcb, gpb = split(jtr)
    d2cb, d2pb = split(jsq)
    gc = reduce_c(gcb)          # local camera rows — no collective
    d2c = reduce_c(d2cb)
    # ONE reverse exchange for both point-side reductions
    gd = reduce_p(jnp.concatenate([gpb, d2pb], axis=1))
    gp, d2p = gd[:, :tp], gd[:, tp:]
    sc = 1.0 / (1.0 + jnp.sqrt(d2c))
    sp = 1.0 / (1.0 + jnp.sqrt(d2p))
    sp_halo = _halo_fwd(sp, srv_l, axis_name)
    Js = J * _mmf(jnp.concatenate([sc[cam_local], sp_halo[pt_halo]],
                                  axis=1), R)
    diag_c = jnp.clip(sc * sc * d2c, min_diag, max_diag)
    diag_p = jnp.clip(sp * sp * d2p, min_diag, max_diag)
    D2c = diag_c / radius
    D2p = diag_p / radius
    rhs_c = sc * gc
    rhs_p = sp * gp
    Minv_c = 1.0 / (diag_c + D2c)
    Minv_p = 1.0 / (diag_p + D2p)

    def matvec(vc, vp):
        vp_h = _halo_fwd(vp, srv_l, axis_name)
        seg = jnp.concatenate([vc[cam_local], vp_h[pt_halo]], axis=1)
        jv = _mmf(Js * _mmf(seg, R), S)
        back = _mmf(Js * _mmf(jv, S.T), R.T)
        cb, pb = split(back)
        return reduce_c(cb) + D2c * vc, reduce_p(pb) + D2p * vp

    return (psum, r, cost, Js, R, S, split, reduce_c, reduce_p, sc, sp,
            gc, gp, diag_c, diag_p, D2c, D2p, rhs_c, rhs_p, Minv_c,
            Minv_p, matvec, cam_local, pt_halo)


def lm_step_camera_halo(cams_l, pts_own, cam_local, pt_halo, obs, srv_l,
                        radius, axis_name, w=None, cg_iters: int = 10):
    """One LM iteration with the camera table device-local and the point
    table OWNER-SHARDED, closed via cut-sized halo exchanges (same LM/CG
    math as lm_step_camera_sharded; accept rule =
    min_relative_decrease, levenberg_marquardt_strategy.cc:69 radius
    update):

     - camera-side reductions shard-local (zero-halo property);
     - point-side reductions close in HALO space: segment-sum by halo id,
       one reverse all-to-all, owner scatter-add — never a P-sized psum;
     - CG state lives in OWNED point space (Pl rows/device); each matvec
       pays one forward + one reverse cut-sized exchange.

    Returns (new cams_l, new pts_own, radius, cost)."""
    env = _halo_linearize(cams_l, pts_own, cam_local, pt_halo, obs, srv_l,
                          radius, axis_name, w)
    (psum, r, cost, Js, R, S, split, reduce_c, reduce_p, sc, sp,
     gc, gp, diag_c, diag_p, D2c, D2p, rhs_c, rhs_p, Minv_c, Minv_p,
     matvec, cam_local_, pt_halo_) = env

    def dots(ac, bc, ap, bp):
        return psum(jnp.sum(ac * bc) + jnp.sum(ap * bp))

    def cg_body(_, state):
        xc, xp, rc, rp, pc, pp, rz = state
        qc, qp = matvec(pc, pp)
        pq = dots(pc, qc, pp, qp)
        alpha = rz / jnp.maximum(pq, 1e-300)
        xc = xc + alpha * pc
        xp = xp + alpha * pp
        rc = rc - alpha * qc
        rp = rp - alpha * qp
        zc = Minv_c * rc
        zp = Minv_p * rp
        rz_new = dots(rc, zc, rp, zp)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        pc = zc + beta * pc
        pp = zp + beta * pp
        return xc, xp, rc, rp, pc, pp, rz_new

    zc0 = Minv_c * rhs_c
    zp0 = Minv_p * rhs_p
    rz0 = dots(rhs_c, zc0, rhs_p, zp0)
    init = (jnp.zeros_like(cams_l), jnp.zeros_like(pts_own), rhs_c, rhs_p,
            zc0, zp0, rz0)
    yc, yp, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)
    step_c, step_p = -yc, -yp
    tp = pts_own.shape[1]

    new_cams = cams_l + step_c * sc
    new_pts = pts_own + step_p * sp
    # ONE forward exchange for the step (jstep/mcc) AND candidate points
    both = _halo_fwd(jnp.concatenate([step_p, new_pts], axis=1), srv_l,
                     axis_name)
    step_p_h, cand_h = both[:, :tp], both[:, tp:]
    segs_step = jnp.concatenate(
        [step_c[cam_local], step_p_h[pt_halo]], axis=1)
    jstep = _mmf(Js * _mmf(segs_step, R), S)
    model_cost_change = psum(-jnp.sum(jstep * (r + jstep / 2.0)))

    new_cost = psum(ba_cost(
        new_cams, cand_h, cam_local, pt_halo, obs, w))
    rel_decrease = (cost - new_cost) / jnp.maximum(model_cost_change, 1e-300)
    accept = (model_cost_change > 0) & (rel_decrease > 1e-3)

    cams_out = jnp.where(accept, new_cams, cams_l)
    pts_out = jnp.where(accept, new_pts, pts_own)
    radius_out = jnp.where(
        accept,
        jnp.minimum(
            radius / jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rel_decrease - 1.0) ** 3),
            1e16,
        ),
        radius / 2.0,
    )
    cost_out = jnp.where(accept, new_cost, cost)
    return cams_out, pts_out, radius_out, cost_out


def make_camera_halo_step(mesh: Mesh, k: int = 1, axis: str = "cam",
                          cg_iters: int = 10):
    """shard_map'd k-iteration halo-exchange LM step. Returns
    step(cams_sh, pts_sh, cam_local_sh, pt_halo_sh, obs_sh, w_sh, srv,
    radius) -> BAState with BOTH tables partitioned over `axis`."""
    from jax import shard_map

    def body(cams_l, pts_l, cam_local, pt_halo, obs_l, w_l, srv_l, radius):
        srv_l = srv_l[0]  # (1, n, Hs) shard block -> (n, Hs)

        def it(_, st):
            c, p, rad, co = st
            return lm_step_camera_halo(
                c, p, cam_local, pt_halo, obs_l, srv_l, rad, axis,
                w=w_l, cg_iters=cg_iters)
        c, p, rad, co = jax.lax.fori_loop(
            0, k, it, (cams_l, pts_l, radius, jnp.asarray(0.0, radius.dtype)))
        return c, p, rad, co

    sh = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                  P(axis, None), P(axis), P(axis, None, None), P()),
        out_specs=(P(axis, None), P(axis, None), P(), P()),
    )

    def step(cams_sh, pts_sh, cam_local_sh, pt_halo_sh, obs_sh, w_sh, srv,
             radius):
        c, p, r, co = sh(cams_sh, pts_sh, cam_local_sh, pt_halo_sh, obs_sh,
                         w_sh, srv, radius)
        return BAState(c, p, r, co)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Ceres-semantics sharded LM (addresses the "simplified LM" gap): the same
# Options subset, step evaluator, and termination taxonomy as the host
# trust-region loop (solver.h:61-816, trust_region_minimizer.cc,
# trust_region_step_evaluator.h), with the CG inner solve running through
# the GENERIC conjugate_gradients (conjugate_gradients_solver.h:109's
# vector-type template ≙ injectable psum-closed dot/norm) so eta/Nash
# q-tolerance and the CG failure taxonomy are identical to single-chip.
# ---------------------------------------------------------------------------

# termination codes (match solvers.fused_lm's internal codes)
HALO_RUNNING = 0
HALO_GRADIENT_TOL = 1
HALO_MIN_RADIUS = 2
HALO_PARAM_TOL = 3
HALO_FUNC_TOL = 4
HALO_INVALID_STEPS = 5


class ShardedLMOptions(NamedTuple):
    """Solver::Options subset honored by the Ceres-semantics sharded LM
    step (defaults = Ceres defaults, solver.h:61-816)."""

    min_relative_decrease: float = 1e-3
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-8
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32
    min_trust_region_radius: float = 1e-32
    max_trust_region_radius: float = 1e16
    eta: float = 1e-1
    max_linear_solver_iterations: int = 500
    max_num_consecutive_invalid_steps: int = 5
    use_nonmonotonic_steps: bool = False
    max_consecutive_nonmonotonic_steps: int = 5

    @classmethod
    def from_options(cls, o):
        """Lift the relevant fields from a ceres_tpu.Options."""
        return cls(
            min_relative_decrease=o.min_relative_decrease,
            function_tolerance=o.function_tolerance,
            gradient_tolerance=o.gradient_tolerance,
            parameter_tolerance=o.parameter_tolerance,
            min_lm_diagonal=o.min_lm_diagonal,
            max_lm_diagonal=o.max_lm_diagonal,
            min_trust_region_radius=o.min_trust_region_radius,
            max_trust_region_radius=o.max_trust_region_radius,
            eta=o.eta,
            max_linear_solver_iterations=o.max_linear_solver_iterations,
            max_num_consecutive_invalid_steps=(
                o.max_num_consecutive_invalid_steps),
            use_nonmonotonic_steps=o.use_nonmonotonic_steps,
            max_consecutive_nonmonotonic_steps=(
                o.max_consecutive_nonmonotonic_steps),
        )


class HaloCarry(NamedTuple):
    cams: jax.Array
    pts: jax.Array
    radius: jax.Array
    cost: jax.Array
    se: tuple            # _SEState scalars
    decrease_factor: jax.Array
    num_invalid: jax.Array
    any_success: jax.Array
    term: jax.Array      # int32 HALO_* code
    it: jax.Array


def lm_step_camera_halo_ceres(carry: HaloCarry, cam_local, pt_halo, obs,
                              srv_l, axis_name, w, opts: ShardedLMOptions,
                              evaluate=None, cost_fn=None,
                              plus_c=None, plus_e=None):
    """One Ceres-semantics LM iteration on the halo-sharded layout:
    levenberg_marquardt_strategy.cc damping/radius rules (incl. the
    doubling decrease factor), trust_region_step_evaluator.h
    (non)monotonic acceptance, trust_region_minimizer.cc tolerance order
    (parameter -> function -> gradient -> min radius), CG failure ->
    invalid-step bound. All decisions are replicated scalars (psum-closed)
    so every shard takes identical branches."""
    from ..solvers.fused_lm import (_se_init, _se_quality, _se_accepted,
                                    _SEState)
    from ..solvers.linear.cg import conjugate_gradients, CG_FAILURE

    cams_l, pts_own, radius = carry.cams, carry.pts, carry.radius
    env = _halo_linearize(cams_l, pts_own, cam_local, pt_halo, obs, srv_l,
                          radius, axis_name, w,
                          min_diag=opts.min_lm_diagonal,
                          max_diag=opts.max_lm_diagonal,
                          evaluate=evaluate)
    (psum, r, cost, Js, R, S, split, reduce_c, reduce_p, sc, sp,
     gc, gp, diag_c, diag_p, D2c, D2p, rhs_c, rhs_p, Minv_c, Minv_p,
     matvec, _cl, _ph) = env
    # TANGENT widths from the linearization (ambient == tangent only for
    # Euclidean blocks; the generic-program tier passes manifold plus_*)
    tc = rhs_c.shape[1]
    tp = rhs_p.shape[1]
    nc = cams_l.shape[0] * tc

    # first iteration: initialize the step-evaluator reference costs
    se = _SEState(*carry.se)
    se = jax.tree_util.tree_map(
        lambda a, b: jnp.where(carry.it == 0, a, b), _se_init(cost), se)

    def flat(vc, vp):
        return jnp.concatenate([vc.reshape(-1), vp.reshape(-1)])

    def unflat(v):
        return (v[:nc].reshape(cams_l.shape[0], tc),
                v[nc:].reshape(pts_own.shape[0], tp))

    def lhs(v):
        vc, vp = unflat(v)
        qc, qp = matvec(vc, vp)
        return flat(qc, qp)

    def precond(v):
        vc, vp = unflat(v)
        return flat(Minv_c * vc, Minv_p * vp)

    def pdot(a, b):
        return psum(jnp.dot(a, b))

    def pnorm(a):
        return jnp.sqrt(psum(jnp.sum(a * a)))

    rhs = flat(rhs_c, rhs_p)
    res = conjugate_gradients(
        lhs, rhs, jnp.zeros_like(rhs), precond,
        max_num_iterations=opts.max_linear_solver_iterations,
        residual_reset_period=10, r_tolerance=-1.0,
        q_tolerance=opts.eta, dot=pdot, norm=pnorm)
    yc, yp = unflat(res.x)
    step_c, step_p = -yc, -yp

    if plus_c is None:
        new_cams = cams_l + step_c * sc
    else:
        new_cams = plus_c(cams_l, step_c * sc)
    if plus_e is None:
        new_pts = pts_own + step_p * sp
    else:
        new_pts = plus_e(pts_own, step_p * sp)
    both = _halo_fwd(jnp.concatenate([step_p, new_pts], axis=1), srv_l,
                     axis_name)
    step_p_h, cand_h = both[:, :tp], both[:, tp:]
    segs_step = jnp.concatenate(
        [step_c[cam_local], step_p_h[pt_halo]], axis=1)
    jstep = _mmf(Js * _mmf(segs_step, R), S)
    mcc = psum(-jnp.sum(jstep * (r + jstep / 2.0)))
    new_cost = psum((cost_fn or ba_cost)(
        new_cams, cand_h, cam_local, pt_halo, obs, w))

    # invalid step: CG failure, non-finite candidate, or non-positive
    # model decrease (trust_region_minimizer.cc:445,467). The step
    # finiteness check is psum-closed so `valid` stays a replicated
    # scalar (every shard must take the same branch).
    bad_x = psum(jnp.sum(jnp.where(jnp.isfinite(res.x), 0.0, 1.0)))
    valid = ((res.termination != CG_FAILURE) & (mcc > 0.0)
             & jnp.isfinite(new_cost) & (bad_x == 0.0))
    num_invalid = jnp.where(valid, 0, carry.num_invalid + 1)
    term = jnp.where(
        (~valid) & (num_invalid >=
                    opts.max_num_consecutive_invalid_steps),
        HALO_INVALID_STEPS, HALO_RUNNING)

    # tolerance checks (trust_region_minimizer.cc order)
    x_norm = jnp.sqrt(psum(jnp.sum(cams_l * cams_l)
                           + jnp.sum(pts_own * pts_own)))
    step_norm = jnp.sqrt(psum(
        jnp.sum((step_c * sc) ** 2) + jnp.sum((step_p * sp) ** 2)))
    ptol = opts.parameter_tolerance
    param_hit = valid & carry.any_success & (
        step_norm <= ptol * (x_norm + ptol))
    cost_change = cost - new_cost
    func_hit = valid & (~param_hit) & (
        jnp.abs(cost_change) <= opts.function_tolerance * cost)
    # Gradient tolerance at the CURRENT iterate (an accepted point, or the
    # initial point): Ceres' GradientToleranceReached tests ||g||_inf at
    # the accepted iterate after relinearizing — gc/gp here ARE that
    # gradient, so testing before the step matches reference semantics
    # and the candidate step is discarded when it fires.
    gmax = jax.lax.pmax(
        jnp.maximum(jnp.max(jnp.abs(gc)), jnp.max(jnp.abs(gp))), axis_name)
    grad_hit = gmax <= opts.gradient_tolerance
    param_hit = param_hit & (~grad_hit)
    func_hit = func_hit & (~grad_hit)
    term = jnp.where(grad_hit, HALO_GRADIENT_TOL, term)
    term = jnp.where(param_hit, HALO_PARAM_TOL,
                     jnp.where(func_hit, HALO_FUNC_TOL,
                               term)).astype(jnp.int32)
    breaking = term != HALO_RUNNING

    # accept / reject through the step evaluator
    max_steps = (opts.max_consecutive_nonmonotonic_steps
                 if opts.use_nonmonotonic_steps else 0)
    rel_dec = _se_quality(se, new_cost, jnp.maximum(mcc, 1e-300))
    success = valid & (~breaking) & (rel_dec > opts.min_relative_decrease)

    cams_out = jnp.where(success, new_cams, cams_l)
    pts_out = jnp.where(success, new_pts, pts_own)
    cost_out = jnp.where(success, new_cost, cost)
    se_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(success, a, b),
        _se_accepted(se, new_cost, jnp.maximum(mcc, 1e-300), max_steps),
        se)

    # radius update (levenberg_marquardt_strategy.cc:69-120: rho-based
    # growth on accept; /decrease_factor with doubling on reject)
    radius_acc = jnp.minimum(
        radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rel_dec - 1.0) ** 3),
        opts.max_trust_region_radius)
    radius_new = jnp.where(success, radius_acc,
                           radius / carry.decrease_factor)
    decrease_new = jnp.where(
        success, jnp.asarray(2.0, radius.dtype),
        jnp.where(breaking, carry.decrease_factor,
                  carry.decrease_factor * 2.0))
    radius_new = jnp.where(breaking, radius, radius_new)

    term = jnp.where(
        (term == HALO_RUNNING)
        & (radius_new <= opts.min_trust_region_radius),
        HALO_MIN_RADIUS, term).astype(jnp.int32)

    return HaloCarry(
        cams_out, pts_out, radius_new, cost_out, tuple(se_new),
        decrease_new, num_invalid, carry.any_success | success, term,
        carry.it + 1)


def make_camera_halo_ceres_step(mesh: Mesh, opts: ShardedLMOptions,
                                k: int = 1, axis: str = "cam",
                                evaluate=None, cost_fn=None,
                                plus_c=None, plus_e=None):
    """shard_map'd k-iteration Ceres-semantics halo LM step with early
    termination. step(carry_arrays..., radius...) -> (BAState, term, it);
    stops inside the while_loop once a termination fires."""
    from jax import shard_map

    def body(cams_l, pts_l, cam_local, pt_halo, obs_l, w_l, srv_l,
             radius, cost, se, decrease, num_invalid, any_success, term,
             it):
        srv_l = srv_l[0]
        carry = HaloCarry(cams_l, pts_l, radius, cost, tuple(se),
                          decrease, num_invalid, any_success, term, it)
        # scalar carry entries enter replicated and stay replicated: every
        # reduction inside lm_step_camera_halo_ceres is psum-closed, so the
        # while_loop carry type is stable under shard_map's vma tracking
        # without any explicit pvary marking
        k_end = it + k

        def cond(c: HaloCarry):
            return (c.term == HALO_RUNNING) & (c.it < k_end)

        def step_once(c: HaloCarry):
            return lm_step_camera_halo_ceres(
                c, cam_local, pt_halo, obs_l, srv_l, axis, w_l, opts,
                evaluate=evaluate, cost_fn=cost_fn,
                plus_c=plus_c, plus_e=plus_e)

        out = jax.lax.while_loop(cond, step_once, carry)
        return (out.cams, out.pts, out.radius, out.cost, tuple(out.se),
                out.decrease_factor, out.num_invalid, out.any_success,
                out.term, out.it)

    rep = P()
    sh = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                  P(axis, None), P(axis), P(axis, None, None),
                  rep, rep, (rep,) * 7, rep, rep, rep, rep, rep),
        out_specs=(P(axis, None), P(axis, None), rep, rep, (rep,) * 7,
                   rep, rep, rep, rep, rep),
    )
    return jax.jit(sh)


def solve_ba_camera_halo_ceres(b, options=None, mesh=None, k=4,
                               axis: str = "cam", radius0=1e4,
                               max_num_iterations=None):
    """End-to-end halo-sharded LM under the Ceres Options surface.
    `options` is a ceres_tpu.Options or ShardedLMOptions (None = Ceres
    defaults). An explicitly passed `max_num_iterations` wins over
    options.max_num_iterations (default 50 when neither is given).
    Returns (BAState, plan, TerminationType)."""
    from ..types import TerminationType

    if options is None:
        opts = ShardedLMOptions()
    elif isinstance(options, ShardedLMOptions):
        opts = options
    else:
        opts = ShardedLMOptions.from_options(options)
        if max_num_iterations is None:
            max_num_iterations = options.max_num_iterations
    if max_num_iterations is None:
        max_num_iterations = 50
    mesh = mesh or make_mesh(axis=axis)
    n = mesh.devices.size
    plan = plan_camera_halo(b.camera_index, b.point_index, b.cameras,
                            b.points, b.observations, n)
    sh = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    cams = jax.device_put(jnp.asarray(plan.cams), sh2)
    pts = jax.device_put(jnp.asarray(plan.pts), sh2)
    cam_local = jax.device_put(jnp.asarray(plan.cam_local), sh)
    pt_ref = jax.device_put(jnp.asarray(plan.pt_halo), sh)
    srv = jax.device_put(jnp.asarray(plan.srv_idx),
                         NamedSharding(mesh, P(axis, None, None)))
    obs = jax.device_put(jnp.asarray(plan.obs), sh2)
    w = jax.device_put(jnp.asarray(plan.w), sh)
    step = make_camera_halo_ceres_step(mesh, opts, k=k, axis=axis)
    dt = cams.dtype
    z = jnp.asarray(0.0, jnp.float64)
    se = (z, z, z, z, z, z, jnp.asarray(0, jnp.int32))
    st = (cams, pts, jnp.asarray(radius0, dt), jnp.asarray(0.0, jnp.float64),
          se, jnp.asarray(2.0, dt), jnp.asarray(0, jnp.int32),
          jnp.asarray(False), jnp.asarray(HALO_RUNNING, jnp.int32),
          jnp.asarray(0, jnp.int32))
    while int(st[9]) < max_num_iterations and int(st[8]) == HALO_RUNNING:
        st = step(st[0], st[1], cam_local, pt_ref, obs, w, srv, *st[2:])
    term_code = int(st[8])
    if term_code in (HALO_GRADIENT_TOL, HALO_MIN_RADIUS, HALO_PARAM_TOL,
                     HALO_FUNC_TOL):
        term = TerminationType.CONVERGENCE
    elif term_code == HALO_INVALID_STEPS:
        term = TerminationType.FAILURE
    else:
        term = TerminationType.NO_CONVERGENCE
    state = BAState(st[0], st[1], st[2], st[3])
    return state, plan, term
