"""Generic-program multi-device Schur/halo tier (round 5).

Lifts the Ceres-semantics halo-sharded LM (sharded_ba.py
lm_step_camera_halo_ceres — the TPU-new scale tier, SURVEY.md §5.7/5.8)
from the hardcoded Snavely arrays to ANY CompiledProgram with a
single-kind two-slot e/f structure: the f-family ("cameras") is sharded
over the mesh axis with its observations, the e-family ("points") is
owner-sharded, and every point-side reduction closes through cut-sized
halo all-to-alls (plan_camera_halo is array-shape agnostic).

What generalizes relative to the BA-specific tier:
 - evaluation: the kind's cost function, vmapped, with the manifold
   chain rule (J_ambient · PlusJacobian, residual_block.cc:70-196) —
   so quaternion-camera BA and other manifold programs shard too;
 - the state update: manifold plus per family instead of `x + step`;
 - observation data: the kind's float data leaves, flattened to a
   (B, d) table and re-split inside the evaluation closure.

Parity contract: 1e-10 against the unsharded f64 evaluation on the
8-device CPU mesh (tests/test_sharding.py); the collective audit covers
the generic path with the same no-P-sized-operand assertions.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import sharded_ba as sb
from ..manifolds import EuclideanManifold


def qualify_program_halo(program, e_families=None):
    """The halo tier's structural gate: ONE kind, two slots in two
    distinct families, both fully variable, trivial loss. Returns
    (kind, fam_f, fam_e) or None. fam_e (owner-sharded, eliminated
    side) comes from the Schur e-set when available, else the larger
    family by block count."""
    if len(program.kinds) != 1:
        return None
    kind = program.kinds[0]
    if len(kind.slots) != 2:
        return None
    from ..loss import TrivialLoss

    if kind.loss is not None and not isinstance(kind.loss, TrivialLoss):
        return None
    fam_a = kind.slots[0].family
    fam_b = kind.slots[1].family
    if fam_a is fam_b:
        return None
    for fam in (fam_a, fam_b):
        if fam.num_var != fam.count:  # constant blocks not supported yet
            return None
        m = getattr(fam, "manifold", None)
        if m is not None and not isinstance(m, EuclideanManifold):
            if not getattr(m, "supports_rows_columns", False):
                return None
    if e_families is None:
        from ..utils.ordering import eligible_e_sets

        e_families = eligible_e_sets(program)
    fams = list(program.families)
    e_set = {id(fams[fi]) for fi in e_families}
    if id(fam_a) in e_set and id(fam_b) not in e_set:
        fam_e, fam_f = fam_a, fam_b
        slot_e, slot_f = 0, 1
    elif id(fam_b) in e_set and id(fam_a) not in e_set:
        fam_e, fam_f = fam_b, fam_a
        slot_e, slot_f = 1, 0
    else:
        # fall back: larger family is eliminated
        if fam_a.count >= fam_b.count:
            fam_e, fam_f, slot_e, slot_f = fam_a, fam_b, 0, 1
        else:
            fam_e, fam_f, slot_e, slot_f = fam_b, fam_a, 1, 0
    return kind, fam_f, fam_e, slot_f, slot_e


def _flat_data(kind):
    """Float data leaves -> ((B, d) table, splitter back to the leaf
    pytree)."""
    leaves, treedef = jax.tree_util.tree_flatten(kind.data)
    shapes = []
    cols = []
    B = kind.B
    for lf in leaves:
        a = np.asarray(lf)
        assert a.shape[0] == B, "per-observation data required"
        shapes.append(a.shape[1:])
        cols.append(np.asarray(a, np.float64).reshape(B, -1))
    table = (np.concatenate(cols, axis=1) if cols
             else np.zeros((B, 1), np.float64))
    widths = [int(np.prod(sh)) if sh else 1 for sh in shapes]

    def split_row(row):
        out = []
        off = 0
        for wdt, sh in zip(widths, shapes):
            piece = jax.lax.dynamic_slice(row, (off,), (wdt,))
            out.append(piece.reshape(sh) if sh else piece[0])
            off += wdt
        return jax.tree_util.tree_unflatten(treedef, out)

    return table, split_row


def build_halo_fns(program, kind, fam_f, fam_e, slot_f, slot_e):
    """(evaluate, cost_fn, plus_c, plus_e) closures for the generalized
    halo step. `evaluate` returns TANGENT-space block jacobians
    (B, r, tf)/(B, r, te) — manifold chain rule applied per observation,
    exactly the unsharded evaluator's math."""
    cost = kind.cost
    _, split_row = _flat_data(kind)
    mf = getattr(fam_f, "manifold", None)
    me = getattr(fam_e, "manifold", None)

    def res_one(cam_p, pt_p, data_row):
        params = [None, None]
        params[slot_f] = cam_p
        params[slot_e] = pt_p
        return cost.residuals(params, split_row(data_row))

    def chain(J, m, x):
        if m is None or isinstance(m, EuclideanManifold):
            return J
        return J @ m.plus_jacobian(x)

    def evaluate(cams_l, halo_pts, cam_local, pt_halo, obs, w):
        cam_p = cams_l[cam_local]
        pt_p = halo_pts[pt_halo]

        def per_obs(c, p, ob):
            r = res_one(c, p, ob)
            Jc, Jp = jax.jacfwd(res_one, argnums=(0, 1))(c, p, ob)
            return r, chain(Jc, mf, c), chain(Jp, me, p)

        r, Jc, Jp = jax.vmap(per_obs)(cam_p, pt_p, obs)
        if w is not None:
            r = r * w[:, None]
            Jc = Jc * w[:, None, None]
            Jp = Jp * w[:, None, None]
        return r, Jc, Jp

    def cost_fn(cams_l, halo_pts, cam_local, pt_halo, obs, w):
        cam_p = cams_l[cam_local]
        pt_p = halo_pts[pt_halo]
        r = jax.vmap(res_one)(cam_p, pt_p, obs)
        if w is not None:
            r = r * w[:, None]
        return 0.5 * jnp.sum(r * r)

    def make_plus(m):
        if m is None or isinstance(m, EuclideanManifold):
            return None
        return jax.vmap(m.plus)

    return evaluate, cost_fn, make_plus(mf), make_plus(me)


def solve_program_camera_halo(program, options=None, mesh=None, k=4,
                              axis: str = "cam", radius0=1e4,
                              max_num_iterations=None,
                              e_families=None):
    """End-to-end generic-program halo-sharded LM: qualification, plan,
    sharded while-loop, write-back into the program state. Returns
    (x_final (state vector), Summary-ish dict, TerminationType)."""
    from ..types import TerminationType

    q = qualify_program_halo(program, e_families)
    if q is None:
        raise ValueError("program does not qualify for the halo tier")
    kind, fam_f, fam_e, slot_f, slot_e = q
    if options is None:
        opts = sb.ShardedLMOptions()
    elif isinstance(options, sb.ShardedLMOptions):
        opts = options
    else:
        opts = sb.ShardedLMOptions.from_options(options)
        if max_num_iterations is None:
            max_num_iterations = options.max_num_iterations
    if max_num_iterations is None:
        max_num_iterations = 50

    mesh = mesh or sb.make_mesh(axis=axis)
    n = mesh.devices.size
    x0 = np.asarray(program.initial_state(), np.float64)
    cams0 = x0[fam_f.state_offset:
               fam_f.state_offset + fam_f.count * fam_f.asize].reshape(
        fam_f.count, fam_f.asize)
    pts0 = x0[fam_e.state_offset:
              fam_e.state_offset + fam_e.count * fam_e.asize].reshape(
        fam_e.count, fam_e.asize)
    cam_index = np.asarray(kind.slots[slot_f].pos_in_family)
    pt_index = np.asarray(kind.slots[slot_e].pos_in_family)
    data_table, _ = _flat_data(kind)

    plan = sb.plan_camera_halo(cam_index, pt_index, cams0, pts0,
                               data_table, n)
    evaluate, cost_fn, plus_c, plus_e = build_halo_fns(
        program, kind, fam_f, fam_e, slot_f, slot_e)

    from jax.sharding import NamedSharding, PartitionSpec as P

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
    step = sb.make_camera_halo_ceres_step(
        mesh, opts, k=k, axis=axis, evaluate=evaluate, cost_fn=cost_fn,
        plus_c=plus_c, plus_e=plus_e)
    dt = cams.dtype
    z = jnp.asarray(0.0, jnp.float64)
    se = (z, z, z, z, z, z, jnp.asarray(0, jnp.int32))
    st = (cams, pts, jnp.asarray(radius0, dt),
          jnp.asarray(0.0, jnp.float64), se, jnp.asarray(2.0, dt),
          jnp.asarray(0, jnp.int32), jnp.asarray(False),
          jnp.asarray(sb.HALO_RUNNING, jnp.int32),
          jnp.asarray(0, jnp.int32))
    while (int(st[9]) < max_num_iterations
           and int(st[8]) == sb.HALO_RUNNING):
        st = step(st[0], st[1], cam_local, pt_ref, obs, w, srv, *st[2:])
    term_code = int(st[8])
    if term_code in (sb.HALO_GRADIENT_TOL, sb.HALO_MIN_RADIUS,
                     sb.HALO_PARAM_TOL, sb.HALO_FUNC_TOL):
        term = TerminationType.CONVERGENCE
    elif term_code == sb.HALO_INVALID_STEPS:
        term = TerminationType.FAILURE
    else:
        term = TerminationType.NO_CONVERGENCE

    # write back: unpad via the plan's slot maps
    cams_fin = np.asarray(st[0])[np.asarray(plan.camera_slot)]
    pts_fin = np.asarray(st[1])[np.asarray(plan.point_slot)]
    x = np.array(x0)
    x[fam_f.state_offset:
      fam_f.state_offset + fam_f.count * fam_f.asize] = cams_fin.reshape(-1)
    x[fam_e.state_offset:
      fam_e.state_offset + fam_e.count * fam_e.asize] = pts_fin.reshape(-1)
    info = {"final_cost": float(st[3]), "iterations": int(st[9]),
            "termination": term}
    return x, info, term
