"""Collective inventory audit for the sharded paths (VERDICT r2 #9).

No multi-chip hardware is reachable here, so scaling efficiency cannot be
measured — but the COMMUNICATION STRUCTURE can be verified at compile
time: lower each sharded step on the 8-device CPU mesh, dump the
optimized HLO, and count collectives. The test fails if GSPMD regresses
into extra collectives (e.g. an accidental all-to-all from a bad
sharding annotation, or a replicated large intermediate forcing extra
all-gathers). This is the no-hardware substitute for BASELINE.md's
>=70% scaling gate: collective COUNTS are what the ICI cost model
multiplies by (guides: one psum per camera-side aggregate for the
point-sharded step; one all-gather + per-reduction psums for the
camera-sharded step; zero all-to-all anywhere).
"""
import re

import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.parallel import sharded_ba

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)\b")


def collective_counts(hlo_text):
    counts = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        if line.startswith("ROOT"):
            line = line[4:].lstrip()
        # count op INSTANCES (lines like "x = all-reduce(...)"), not
        # uses; the result type may be a TUPLE "(f64[..], ..)" with
        # spaces (e.g. CPU all-to-all), so match both forms
        m = re.match(
            r"[%\w.\-]+\s*=\s*(?:\([^)]*\)|\S+)\s+([a-z\-]+)\(", line)
        if not m:
            continue
        op = m.group(1)
        if COLLECTIVE_RE.fullmatch(op):
            counts[op] = counts.get(op, 0) + 1
    return counts


def _bal_small():
    b = bal.synthetic_bal(num_cameras=16, num_points=256, visibility=0.3,
                          noise=0.3, seed=3)
    return bal.perturb(b, 0.02, 0.1, 0.1)


def test_point_sharded_step_collectives():
    """Point-sharded exact-Schur k-step: every camera-side aggregate is
    closed with ONE psum (all-reduce); no all-to-all, no all-gather of
    B-sized or P-sized arrays (point state never leaves the shard)."""
    import jax
    import jax.numpy as jnp

    b = _bal_small()
    mesh = sharded_ba.make_mesh(8, axis="pt")
    n = 8
    plan = sharded_ba.plan_point_sharding(
        b.camera_index, b.point_index, b.points, b.observations, n)
    step = sharded_ba.make_point_sharded_step(mesh, k=2, axis="pt")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("pt"))
    sh2 = NamedSharding(mesh, P("pt", None))
    repl = NamedSharding(mesh, P())
    args = (
        jax.device_put(jnp.asarray(b.cameras), repl),
        jax.device_put(jnp.asarray(plan.pts), sh2),
        jax.device_put(jnp.asarray(plan.cam_idx), sh),
        jax.device_put(jnp.asarray(plan.pt_local), sh),
        jax.device_put(jnp.asarray(plan.obs), sh2),
        jax.device_put(jnp.asarray(plan.w), sh),
        jnp.asarray(1e4, jnp.float64),
    )
    hlo = step.lower(*args).compile().as_text()
    counts = collective_counts(hlo)
    assert counts.get("all-to-all", 0) == 0, counts
    # camera aggregates per iteration: gc/d2c (fused), F'F, A'A, A'u,
    # cost, new_cost, and the two model-cost scalars — scalars may fuse.
    # Bound: <= 10 all-reduces per iteration; and at least one (it must
    # communicate SOMETHING).
    ar = counts.get("all-reduce", 0)
    assert 1 <= ar <= 10 * 2, f"all-reduce count {ar} out of range: {counts}"
    # the point table must NOT be all-gathered in the point-sharded step
    for line in hlo.splitlines():
        if "all-gather" in line and "f64[" in line:
            sizes = re.findall(r"f64\[(\d+)", line)
            for s in sizes:
                assert int(s) < plan.Pl * n, (
                    f"P-sized all-gather in point-sharded step: {line[:120]}")


def test_camera_sharded_step_collectives():
    """Fully-sharded (camera+point) CG step: exactly one all-gather of the
    point table per iteration; psums for point-side reductions and CG
    scalars; no all-to-all."""
    import jax
    import jax.numpy as jnp

    b = _bal_small()
    n = 8
    mesh = sharded_ba.make_mesh(n, axis="cam")
    plan = sharded_ba.plan_camera_sharding(
        b.camera_index, b.point_index, b.cameras, b.points,
        b.observations, n)
    cg_iters = 4
    step = sharded_ba.make_camera_sharded_step(mesh, k=1, axis="cam",
                                               cg_iters=cg_iters)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("cam"))
    sh2 = NamedSharding(mesh, P("cam", None))
    args = (
        jax.device_put(jnp.asarray(plan.cams), sh2),
        jax.device_put(jnp.asarray(plan.pts), sh2),
        jax.device_put(jnp.asarray(plan.cam_local), sh),
        jax.device_put(jnp.asarray(plan.pt_slot), sh),
        jax.device_put(jnp.asarray(plan.obs), sh2),
        jax.device_put(jnp.asarray(plan.w), sh),
        jnp.asarray(1e4, jnp.float64),
    )
    hlo = step.lower(*args).compile().as_text()
    counts = collective_counts(hlo)
    assert counts.get("all-to-all", 0) == 0, counts
    # ONE all-gather for the point table (XLA may split it, allow <= 2)
    ag = counts.get("all-gather", 0)
    assert 1 <= ag <= 2, f"all-gather count {ag}: {counts}"
    # psums: point reductions (gp/d2p fused or not), per-CG-iteration
    # matvec point reduce + 2 scalar dots, cost/new_cost/mcc scalars.
    ar = counts.get("all-reduce", 0)
    assert 1 <= ar <= 8 + 4 * cg_iters, (
        f"all-reduce count {ar} out of range: {counts}")


def test_generic_sharded_evaluator_collectives():
    """Generic obs-sharded evaluation (parallel/mesh.py): gradient psum
    only — no all-to-all, no all-gather of the observation arrays."""
    import jax

    from ceres_tpu.parallel.mesh import ShardedProgramEvaluator, make_mesh
    from ceres_tpu.program import CompiledProgram

    b = _bal_small()
    problem, _, _ = bal.build_problem_batched(b)
    prog = CompiledProgram(problem)
    ev = ShardedProgramEvaluator(prog, make_mesh(8))
    x = prog.initial_state()
    hlo = ev._grad.lower(x, ev.args).compile().as_text()
    counts = collective_counts(hlo)
    assert counts.get("all-to-all", 0) == 0, counts
    assert counts.get("all-reduce", 0) >= 1, counts


def test_camera_halo_step_collectives():
    """Halo-exchange fully-sharded step (VERDICT r3 #3): every point-side
    collective is CUT-sized — no P-sized operand in any collective, no
    all-gather of the point table at all; all-to-alls are (n*Hs, d)."""
    import jax
    import jax.numpy as jnp

    b = _bal_small()
    n = 8
    mesh = sharded_ba.make_mesh(n, axis="cam")
    plan = sharded_ba.plan_camera_halo(
        b.camera_index, b.point_index, b.cameras, b.points,
        b.observations, n)
    cg_iters = 4
    step = sharded_ba.make_camera_halo_step(mesh, k=1, axis="cam",
                                            cg_iters=cg_iters)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("cam"))
    sh2 = NamedSharding(mesh, P("cam", None))
    args = (
        jax.device_put(jnp.asarray(plan.cams), sh2),
        jax.device_put(jnp.asarray(plan.pts), sh2),
        jax.device_put(jnp.asarray(plan.cam_local), sh),
        jax.device_put(jnp.asarray(plan.pt_halo), sh),
        jax.device_put(jnp.asarray(plan.obs), sh2),
        jax.device_put(jnp.asarray(plan.w), sh),
        jax.device_put(jnp.asarray(plan.srv_idx),
                       NamedSharding(mesh, P("cam", None, None))),
        jnp.asarray(1e4, jnp.float64),
    )
    lowered = step.lower(*args)
    hlo = lowered.compile().as_text()
    counts = collective_counts(hlo)
    # NO all-gather of the point table
    assert counts.get("all-gather", 0) == 0, counts
    # halo exchanges: <= (4 + 2*cg) all-to-alls per iteration (XLA may
    # fuse or split some)
    a2a = counts.get("all-to-all", 0)
    assert 1 <= a2a <= 6 + 2 * cg_iters, counts
    # no P-sized operand in ANY collective: every collective operand's
    # leading dim must be <= n*Hs (the cut), never P_pad
    P_pad = plan.pts.shape[0]
    Hl = plan.n * plan.Hs
    assert Hl < P_pad, (Hl, P_pad)  # the test instance has a real cut
    for line in hlo.splitlines():
        line = line.strip()
        if line.startswith("ROOT"):
            line = line[4:].lstrip()
        m = re.match(
            r"[%\w.\-]+\s*=\s*((?:\([^)]*\)|\S+))\s+"
            r"(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter)\(", line)
        if not m:
            continue
        shapes = re.findall(r"f\d+\[([\d,]*)\]", m.group(1))
        for s in shapes:
            if not s:
                continue
            dims = [int(d) for d in s.split(",")]
            assert max(dims) < P_pad, (
                f"P-sized collective operand: {line[:120]}")


def test_camera_halo_matches_dense_sharded():
    """Halo step == dense-gather step to fp64 tightness on the same
    plan-compatible problem (1e-10: same math, different collectives)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    b = _bal_small()
    bp = b
    st_d, _ = sharded_ba.solve_ba_camera_sharded(
        bp, num_iterations=2, mesh=sharded_ba.make_mesh(8, axis="cam"),
        k=1, cg_iters=6, halo=False)
    st_h, plan_h = sharded_ba.solve_ba_camera_sharded(
        bp, num_iterations=2, mesh=sharded_ba.make_mesh(8, axis="cam"),
        k=1, cg_iters=6, halo=True)
    np.testing.assert_allclose(float(st_h.cost), float(st_d.cost),
                               rtol=1e-10)


def test_generic_program_halo_step_collectives():
    """The GENERALIZED halo tier (parallel/sharded_program.py): same
    audit as the BA-specific step — no all-gather of the point table,
    cut-sized all-to-alls only, no P-sized operand in any collective —
    now compiled from an arbitrary CompiledProgram's kind (here the
    quaternion-manifold BA, exercising the in-evaluation chain rule and
    the manifold plus inside the sharded while_loop)."""
    import jax
    import jax.numpy as jnp

    import ceres_tpu as ct
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_program as sp
    from ceres_tpu.program import CompiledProgram

    b = _bal_small()
    pq, _, _ = bal.build_problem_batched_quat(b)
    prog = CompiledProgram(pq)
    q = sp.qualify_program_halo(prog)
    assert q is not None
    kind, fam_f, fam_e, slot_f, slot_e = q
    n = 8
    mesh = sharded_ba.make_mesh(n, axis="cam")
    import numpy as np

    x0 = np.asarray(prog.initial_state(), np.float64)
    cams0 = x0[fam_f.state_offset:
               fam_f.state_offset + fam_f.count * fam_f.asize].reshape(
        fam_f.count, fam_f.asize)
    pts0 = x0[fam_e.state_offset:
              fam_e.state_offset + fam_e.count * fam_e.asize].reshape(
        fam_e.count, fam_e.asize)
    data_table, _ = sp._flat_data(kind)
    plan = sharded_ba.plan_camera_halo(
        np.asarray(kind.slots[slot_f].pos_in_family),
        np.asarray(kind.slots[slot_e].pos_in_family),
        cams0, pts0, data_table, n)
    evaluate, cost_fn, plus_c, plus_e = sp.build_halo_fns(
        prog, kind, fam_f, fam_e, slot_f, slot_e)
    opts = sharded_ba.ShardedLMOptions(max_linear_solver_iterations=4)
    step = sharded_ba.make_camera_halo_ceres_step(
        mesh, opts, k=1, axis="cam", evaluate=evaluate, cost_fn=cost_fn,
        plus_c=plus_c, plus_e=plus_e)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("cam"))
    sh2 = NamedSharding(mesh, P("cam", None))
    dt = jnp.float64
    z = jnp.asarray(0.0, dt)
    se = (z, z, z, z, z, z, jnp.asarray(0, jnp.int32))
    args = (
        jax.device_put(jnp.asarray(plan.cams), sh2),
        jax.device_put(jnp.asarray(plan.pts), sh2),
        jax.device_put(jnp.asarray(plan.cam_local), sh),
        jax.device_put(jnp.asarray(plan.pt_halo), sh),
        jax.device_put(jnp.asarray(plan.obs), sh2),
        jax.device_put(jnp.asarray(plan.w), sh),
        jax.device_put(jnp.asarray(plan.srv_idx),
                       NamedSharding(mesh, P("cam", None, None))),
        jnp.asarray(1e4, dt), z, se, jnp.asarray(2.0, dt),
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(sharded_ba.HALO_RUNNING, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    hlo = step.lower(*args).compile().as_text()
    counts = collective_counts(hlo)
    assert counts.get("all-gather", 0) == 0, counts
    P_pad = plan.pts.shape[0]
    Hl = plan.n * plan.Hs
    assert Hl < P_pad, (Hl, P_pad)
    for line in hlo.splitlines():
        line = line.strip()
        if line.startswith("ROOT"):
            line = line[4:].lstrip()
        m = re.match(
            r"[%\w.\-]+\s*=\s*((?:\([^)]*\)|\S+))\s+"
            r"(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter)\(", line)
        if not m:
            continue
        shapes = re.findall(r"f\d+\[([\d,]*)\]", m.group(1))
        for s_ in shapes:
            if not s_:
                continue
            dims = [int(d) for d in s_.split(",")]
            assert max(dims) < P_pad, (
                f"P-sized collective operand: {line[:120]}")
