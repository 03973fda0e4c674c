"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by the benchmark)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("num_blocks,N,t", [(300, 1200, 3), (16, 4000, 9), (130, 130, 4)])
def test_jt_u_sorted_matches_scatter(num_blocks, N, t):
    rng = np.random.default_rng(num_blocks + N)
    ids = np.sort(rng.integers(0, num_blocks, N)).astype(np.int32)
    J = rng.standard_normal((N, 2, t)).astype(np.float32)
    u = rng.standard_normal((N, 2)).astype(np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, num_blocks, 128)
    out = pk.jt_u_sorted(
        jnp.asarray(J), jnp.asarray(u), jnp.asarray(ids),
        jnp.asarray(tile_starts), num_blocks, max_rows=max_rows, interpret=True,
    )
    ref = np.zeros((num_blocks, t), np.float32)
    np.add.at(ref, ids, np.einsum("nrt,nr->nt", J, u))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@pytest.mark.parametrize("num_blocks,N,t", [(300, 1200, 3), (129, 600, 9)])
def test_expand_matches_take(num_blocks, N, t):
    rng = np.random.default_rng(num_blocks)
    ids = np.sort(rng.integers(0, num_blocks, N)).astype(np.int32)
    vals = rng.standard_normal((num_blocks, t)).astype(np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, num_blocks)
    out = pk.segment_block_expand(
        jnp.asarray(vals), jnp.asarray(ids), jnp.asarray(tile_starts), N,
        max_rows=max_rows, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), vals[ids], atol=1e-6)


def test_empty_blocks_get_zero():
    # blocks with no observations must come out exactly zero
    ids = np.asarray([0, 0, 5, 5, 5], np.int32)
    J = np.ones((5, 1, 2), np.float32)
    u = np.ones((5, 1), np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, 8)
    out = np.asarray(
        pk.jt_u_sorted(
            jnp.asarray(J), jnp.asarray(u), jnp.asarray(ids),
            jnp.asarray(tile_starts), 8, max_rows=max_rows, interpret=True,
        )
    )
    np.testing.assert_allclose(out[0], [2, 2])
    np.testing.assert_allclose(out[5], [3, 3])
    np.testing.assert_allclose(out[[1, 2, 3, 4, 6, 7]], 0)


def test_segment_spread_sum_interpret():
    """Fused A-assembly spread+reduce kernel vs the XLA reference
    (materialized (B, tp*C*tc) spread + scatter segment sum)."""
    import numpy as np
    from ceres_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    P, C, tp, tc = 37, 5, 3, 9
    N = 400
    pt = np.sort(rng.integers(0, P, N)).astype(np.int32)
    cam = rng.integers(0, C, N).astype(np.int32)
    Y = rng.standard_normal((N, tp * tc)).astype(np.float32)
    starts, max_rows = pk.plan_block_tiles(pt, P)
    out = pk.segment_spread_sum(
        jnp.asarray(Y), jnp.asarray(cam), jnp.asarray(pt),
        jnp.asarray(starts), P, C, tp, tc, max_rows=max_rows,
        interpret=True,
    )[:P]
    # reference
    H1 = np.kron(np.eye(tp), np.kron(np.ones((1, C)), np.eye(tc)))
    oh = np.eye(C, dtype=np.float32)[cam]
    H2 = np.kron(np.ones((1, tp)), np.kron(np.eye(C), np.ones((1, tc))))
    T = (Y @ H1) * (oh @ H2)
    ref = np.zeros((P, tp * C * tc), np.float32)
    np.add.at(ref, pt, T)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_schur_core_spread_kernel_interpret():
    """lm_step_schur with the fused spread kernel (interpret mode) matches
    the scatter path."""
    import numpy as np
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba as sb
    from ceres_tpu.ops import pallas_kernels as pk

    b = bal.synthetic_bal(num_cameras=5, num_points=40, visibility=0.6,
                          noise=0.2, seed=2)
    bp = bal.perturb(b, 0.01, 0.05, 0.05)
    order = np.argsort(np.asarray(bp.point_index), kind="stable")
    cams = jnp.asarray(bp.cameras, jnp.float32)
    pts = jnp.asarray(bp.points, jnp.float32)
    cam_idx = jnp.asarray(np.asarray(bp.camera_index)[order])
    pt_idx = jnp.asarray(np.asarray(bp.point_index)[order])
    obs = jnp.asarray(np.asarray(bp.observations)[order], jnp.float32)
    radius = jnp.asarray(1e4, jnp.float32)
    base = sb.lm_step_schur(cams, pts, cam_idx, pt_idx, obs, radius)
    plan = pk.plan_block_tiles(np.asarray(pt_idx), bp.num_points)
    pal = sb.lm_step_schur(cams, pts, cam_idx, pt_idx, obs, radius,
                           pallas_plan=plan, pallas_interpret=True)
    # the spread kernel's hi+lo bf16 split is ~1e-5 relative on A; through
    # the f32 Cholesky that bounds the step difference around 1e-3
    np.testing.assert_allclose(np.asarray(pal.cams), np.asarray(base.cams),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pal.pts), np.asarray(base.pts),
                               rtol=2e-3, atol=2e-3)


def _isc_ref(Jf, Je, pt, cam, P, C, z=None, minv=None, xp=None):
    """Naive numpy reference for the fused matvec kernels."""
    B, r, tf = Jf.shape
    te = Je.shape[2]
    zc = z.reshape(C, tf)
    fz = np.einsum("brf,bf->br", Jf, zc[np.clip(cam, 0, C - 1)])
    fz[cam >= C] = np.einsum(
        "brf,f->br", Jf[cam >= C], np.zeros(tf))  # sentinel camera -> 0
    if xp is not None:  # normal mode
        xpb = np.zeros((B, te))
        ok = pt < P
        xpb[ok] = xp[pt[ok]]
        jv = fz + np.einsum("bre,be->br", Je, xpb)
        ptout = np.zeros((P, te))
        np.add.at(ptout, np.clip(pt, 0, P - 1),
                  np.where(ok[:, None], np.einsum("bre,br->be", Je, jv), 0.0))
        camout = np.zeros((C, tf))
        okc = cam < C
        np.add.at(camout, np.clip(cam, 0, C - 1),
                  np.where(okc[:, None], np.einsum("brf,br->bf", Jf, jv), 0.0))
        return camout, ptout
    etfz = np.zeros((P, te))
    ok = pt < P
    np.add.at(etfz, np.clip(pt, 0, P - 1),
              np.where(ok[:, None], np.einsum("bre,br->be", Je, fz), 0.0))
    u = np.einsum("pij,pj->pi", minv.reshape(P, te, te), etfz)
    ub = np.zeros((B, te))
    ub[ok] = u[pt[ok]]
    q = fz - np.einsum("bre,be->br", Je, ub)
    camout = np.zeros((C, tf))
    okc = cam < C
    np.add.at(camout, np.clip(cam, 0, C - 1),
              np.where(okc[:, None], np.einsum("brf,br->bf", Jf, q), 0.0))
    return camout, u


@pytest.mark.parametrize("P,C,B,r,tf,te", [
    (300, 13, 2000, 2, 9, 3),
    (40, 140, 700, 2, 9, 3),   # C spills past one 128 lane tile
    (130, 5, 900, 3, 4, 2),    # non-BA block shapes
])
def test_isc_matvec_kernel_interpret(P, C, B, r, tf, te):
    rng = np.random.default_rng(P + C)
    pt = np.sort(rng.integers(0, P, B)).astype(np.int32)
    cam = rng.integers(0, C, B).astype(np.int32)
    # sentinel rows: constant point block (pt == P) and constant camera
    pt[-3:] = P
    cam[5] = C
    Jf = rng.standard_normal((B, r, tf)).astype(np.float32)
    Je = rng.standard_normal((B, r, te)).astype(np.float32)
    Je[pt == P] = 0.0  # constant point: e lanes vanish from the tangent
    Jf[cam >= C] = 0.0
    z = rng.standard_normal(C * tf).astype(np.float32)
    minv = rng.standard_normal((P, te * te)).astype(np.float32)
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1, target_rows=256)
    JT, ids_T = pk.prep_matvec_rows(
        jnp.asarray(Jf.reshape(B, -1)), jnp.asarray(Je.reshape(B, -1)),
        jnp.asarray(pt), jnp.asarray(cam), max_rows, r, tf, te)
    camv, u = pk.isc_matvec(
        JT, ids_T, jnp.asarray(z), jnp.asarray(minv),
        jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
        max_rows=max_rows, interpret=True)
    camv2, u2 = pk.isc_matvec(
        JT, ids_T, jnp.asarray(z), jnp.asarray(minv),
        jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
        max_rows=max_rows, interpret=True, emit_u=False)
    assert u2 is None
    np.testing.assert_allclose(np.asarray(camv2), np.asarray(camv),
                               rtol=1e-5, atol=1e-4)
    cam_ref, u_ref = _isc_ref(Jf, Je, pt, cam, P, C, z=z, minv=minv)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(camv), cam_ref.reshape(-1),
                               rtol=2e-4, atol=5e-4)
    # pretransposed per-tile Minv table (the CG fast path) is bit-level
    # the same math — must match the legacy layout exactly
    mtab = pk.build_minv_tile_table(jnp.asarray(minv), tb, te)
    camv3, u3 = pk.isc_matvec(
        JT, ids_T, jnp.asarray(z), jnp.asarray(minv),
        jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
        max_rows=max_rows, interpret=True, minv_tiled=mtab)
    np.testing.assert_allclose(np.asarray(camv3), np.asarray(camv),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u),
                               rtol=0, atol=0)


@pytest.mark.parametrize("P,C,B,r,tf,te", [
    (300, 13, 2000, 2, 9, 3),
    (64, 200, 800, 1, 6, 5),
])
def test_normal_matvec_kernel_interpret(P, C, B, r, tf, te):
    rng = np.random.default_rng(P * 7 + C)
    pt = np.sort(rng.integers(0, P, B)).astype(np.int32)
    cam = rng.integers(0, C, B).astype(np.int32)
    pt[-2:] = P
    Jf = rng.standard_normal((B, r, tf)).astype(np.float32)
    Je = rng.standard_normal((B, r, te)).astype(np.float32)
    Je[pt == P] = 0.0
    xc = rng.standard_normal(C * tf).astype(np.float32)
    xp = rng.standard_normal((P, te)).astype(np.float32)
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1, target_rows=256)
    JT, ids_T = pk.prep_matvec_rows(
        jnp.asarray(Jf.reshape(B, -1)), jnp.asarray(Je.reshape(B, -1)),
        jnp.asarray(pt), jnp.asarray(cam), max_rows, r, tf, te)
    camv, ptv = pk.normal_matvec(
        JT, ids_T, jnp.asarray(xc), jnp.asarray(xp),
        jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
        max_rows=max_rows, interpret=True)
    cam_ref, pt_ref = _isc_ref(Jf, Je, pt, cam, P, C, z=xc, xp=xp)
    np.testing.assert_allclose(np.asarray(ptv), pt_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(camv), cam_ref.reshape(-1),
                               rtol=2e-4, atol=5e-4)


def test_segment_spread_sum_ftf_interpret():
    """The kernel's in-VMEM F'F accumulation matches the XLA outer+reduce
    formulation (camera Gram blocks of the scaled Jacobian)."""
    import numpy as np
    from ceres_tpu.ops import pallas_kernels as pk
    from ceres_tpu.parallel import sharded_ba as sb

    rng = np.random.default_rng(7)
    P, C, B, r, tc, tp = 300, 5, 1100, 2, 9, 3
    pt_idx = np.sort(rng.integers(0, P, B)).astype(np.int32)
    cam_idx = rng.integers(0, C, B).astype(np.int32)
    Y = rng.normal(size=(B, tp * tc)).astype(np.float32)
    Jc = rng.normal(size=(B, r * tc)).astype(np.float32)
    ts, max_rows = pk.plan_block_tiles(pt_idx, P)
    A, ftf = pk.segment_spread_sum(
        jnp.asarray(Y), jnp.asarray(cam_idx), jnp.asarray(pt_idx),
        jnp.asarray(ts), P, C, tp, tc, max_rows=max_rows, interpret=True,
        Jc=jnp.asarray(Jc), r=r,
    )
    # XLA reference
    import jax
    oh = jax.nn.one_hot(jnp.asarray(cam_idx), C, dtype=jnp.float32)
    jctjc = sb._outer_flat(
        jnp.asarray(Jc), jnp.asarray(Jc),
        sb._outer_selectors(r, tc, tc, jnp.float32),
    )
    ref = jnp.einsum("bk,bc->ck", jctjc, oh,
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ftf), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("P,C,B,r,tf,te", [
    (150, 7, 900, 2, 9, 3),
    (64, 5, 500, 2, 4, 2),
])
def test_schur_assembly_kernel_interpret(P, C, B, r, tf, te):
    """The one-kernel dense-Schur assembly (A'A, FtF, A'u weights) matches
    the materialized-A reference."""
    import jax
    rng = np.random.default_rng(P * 3 + C)
    pt = np.sort(rng.integers(0, P, B)).astype(np.int32)
    cam = rng.integers(0, C, B).astype(np.int32)
    pt[-2:] = P  # constant-point rows
    cam[3] = C   # constant-camera row
    Jf = rng.standard_normal((B, r, tf)).astype(np.float32)
    Je = rng.standard_normal((B, r, te)).astype(np.float32)
    Je[pt == P] = 0.0
    Jf[cam >= C] = 0.0
    sc = rng.uniform(0.5, 1.5, (C, tf)).astype(np.float32)
    sp = rng.uniform(0.5, 1.5, (P, te)).astype(np.float32)
    Kf = rng.standard_normal((P, te, te)).astype(np.float32)
    u = rng.standard_normal((P, te)).astype(np.float32)
    # reference
    scb = np.zeros((B, tf), np.float32)
    scb[cam < C] = sc[cam[cam < C]]
    spb = np.zeros((B, te), np.float32)
    spb[pt < P] = sp[pt[pt < P]]
    Kfb = np.zeros((B, te, te), np.float32)
    Kfb[pt < P] = Kf[pt[pt < P]]
    ub = np.zeros((B, te), np.float32)
    ub[pt < P] = u[pt[pt < P]]
    Jsf = Jf * scb[:, None, :]
    Jsp = Je * spb[:, None, :]
    W = np.einsum("bri,brj->bij", Jsp, Jsf)  # (B, te, tf)
    Y = np.einsum("bik,bkj->bij", Kfb, W)    # (B, te, tf)
    t_full = C * tf
    A = np.zeros((P * te, t_full), np.float64)
    for b in range(B):
        if pt[b] >= P:
            continue
        c = cam[b]
        if c >= C:
            # constant camera: Y still spreads into no camera column
            continue
        for i in range(te):
            A[pt[b] * te + i, c * tf:(c + 1) * tf] += Y[b, i]
    # constant-point rows still contribute F'F (their Y is zero via Je=0)
    AtA_ref = A.T @ A
    FtF_ref = np.zeros((C, tf, tf))
    for b in range(B):
        c = cam[b]
        if c >= C:
            continue
        FtF_ref[c] += Jsf[b].T @ Jsf[b]
    Atu_ref = A.T @ (
        np.concatenate([u, np.zeros((1, te))])[
            np.minimum(np.arange(P), P - 1)].reshape(-1)
        if False else u.reshape(-1))

    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1, target_rows=256)
    JT, ids_T = pk.prep_matvec_rows(
        jnp.asarray(Jf.reshape(B, -1)), jnp.asarray(Je.reshape(B, -1)),
        jnp.asarray(pt), jnp.asarray(cam), max_rows, r, tf, te)
    C_pad = max(128, -(-(C + 1) // 128) * 128)
    sc_T = np.zeros((gf, C_pad), np.float32)
    sc_T[:tf, :C] = sc.T
    pw = np.zeros((P + 1 + 128, 128), np.float32)
    pw[:P, 0:te] = sp
    pw[:P, 8:8 + te * te] = Kf.reshape(P, te * te)
    pw[:P, 24:24 + te] = u
    ata, ftf, U = pk.schur_assembly(
        JT, ids_T, jnp.asarray(sc_T), jnp.asarray(pw),
        jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
        max_rows=max_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(ata), AtA_ref, rtol=5e-4,
                               atol=5e-3)
    ftf_np = np.asarray(ftf)[:C].reshape(C, tf, gf)[:, :, :tf]
    np.testing.assert_allclose(ftf_np, FtF_ref, rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(U)[0], Atu_ref, rtol=5e-4,
                               atol=5e-3)


def test_lm_step_schur_v2_matches_v1_interpret():
    """The one-kernel assembly pipeline (lm_step_schur_v2_*) reproduces the
    staged v1 trajectory over several LM iterations."""
    import jax
    import numpy as np
    from ceres_tpu.models import bal
    from ceres_tpu.parallel import sharded_ba as sb

    b = bal.synthetic_bal(num_cameras=5, num_points=150, visibility=0.5,
                          noise=0.3, seed=4)
    bp = bal.perturb(b, 0.01, 0.05, 0.05)
    P, C = bp.num_points, bp.num_cameras
    order = np.argsort(np.asarray(bp.point_index), kind="stable")
    cams = jnp.asarray(bp.cameras, jnp.float32)
    pts = jnp.asarray(bp.points, jnp.float32)
    cam_idx = jnp.asarray(np.asarray(bp.camera_index)[order])
    pt_idx = jnp.asarray(np.asarray(bp.point_index)[order])
    obs = jnp.asarray(np.asarray(bp.observations)[order], jnp.float32)
    radius = jnp.asarray(1e4, jnp.float32)
    blk = pk.plan_block_tiles(np.asarray(pt_idx), P)
    # v1, 3 iterations via the carry
    carry = sb.lm_step_schur_init(cams, pts, cam_idx, pt_idx, obs, radius,
                                  None, blk, pallas_interpret=True)
    for _ in range(3):
        carry = sb.lm_step_schur_next(carry, cam_idx, pt_idx, obs, None,
                                      blk, pallas_interpret=True)
    # v2
    plan = sb.build_asm_plan(cam_idx, pt_idx, P, C)
    st2 = sb.lm_step_schur_v2_k(cams, pts, cam_idx, pt_idx,
                                jnp.asarray(obs.T), radius, plan, k=3,
                                interpret=True)
    assert float(st2.cost) == pytest.approx(float(carry.cost), rel=2e-3)
    np.testing.assert_allclose(np.asarray(st2.cams), np.asarray(carry.cams),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st2.pts), np.asarray(carry.pts),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("mode", ["isc", "normal"])
def test_windowed_matvec_interpret(local, mode):
    """Camera-windowed large-C path (plan_camera_windows): per-tile
    window one-hots + RMW camera scatter reproduce the reference product.
    `local=True` exercises the narrow-window fast case (points ordered by
    camera locality), `local=False` forces multi-chunk windows
    (n_win > 1) via scattered camera ids."""
    import numpy as np

    P, C, B, r, tf, te = 500, 700, 4000, 2, 9, 3
    rng = np.random.default_rng(11 + local + (mode == "isc"))
    pt = np.sort(rng.integers(0, P, B)).astype(np.int32)
    if local:
        # camera near the point's relative position: narrow windows
        cam = np.clip(
            (pt.astype(np.float64) / P * C).astype(np.int64)
            + rng.integers(-40, 40, B), 0, C - 1).astype(np.int32)
    else:
        cam = rng.integers(0, C, B).astype(np.int32)
    pt[-3:] = P
    cam[7] = C  # sentinel camera
    Jf = rng.standard_normal((B, r, tf)).astype(np.float32)
    Je = rng.standard_normal((B, r, te)).astype(np.float32)
    Je[pt == P] = 0.0
    Jf[cam >= C] = 0.0
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1, target_rows=256)
    windows = pk.plan_camera_windows(pt, cam, tb, P, C, width_cap=256)
    if local:
        assert windows[2] == 1 and windows[1] <= 256
    else:
        assert windows[2] > 1
    JT, ids_T = pk.prep_matvec_rows(
        jnp.asarray(Jf.reshape(B, -1)), jnp.asarray(Je.reshape(B, -1)),
        jnp.asarray(pt), jnp.asarray(cam), max_rows, r, tf, te)
    if mode == "isc":
        z = rng.standard_normal(C * tf).astype(np.float32)
        minv = rng.standard_normal((P, te * te)).astype(np.float32)
        camv, u = pk.isc_matvec(
            JT, ids_T, jnp.asarray(z), jnp.asarray(minv),
            jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
            max_rows=max_rows, interpret=True, windows=windows)
        cam_ref, u_ref = _isc_ref(Jf, Je, pt, cam, P, C, z=z, minv=minv)
        np.testing.assert_allclose(np.asarray(u), u_ref, rtol=2e-4,
                                   atol=2e-4)
    else:
        xc = rng.standard_normal(C * tf).astype(np.float32)
        xp = rng.standard_normal((P, te)).astype(np.float32)
        camv, ptv = pk.normal_matvec(
            JT, ids_T, jnp.asarray(xc), jnp.asarray(xp),
            jnp.asarray(ts), jnp.asarray(tb), P, C, r, tf, te,
            max_rows=max_rows, interpret=True, windows=windows)
        cam_ref, pt_ref = _isc_ref(Jf, Je, pt, cam, P, C, z=xc, xp=xp)
        np.testing.assert_allclose(np.asarray(ptv), pt_ref, rtol=2e-4,
                                   atol=2e-4)
    np.testing.assert_allclose(np.asarray(camv), cam_ref.reshape(-1),
                               rtol=2e-4, atol=5e-4)


@pytest.mark.parametrize("local", [True, False])
def test_windowed_segment_sum_interpret(local):
    """windowed_segment_sum (UNSORTED ids + fixed-tile windows) matches
    np.add.at; sentinel ids (<0, >=num_blocks) contribute nothing."""
    import numpy as np

    rng = np.random.default_rng(3 + local)
    n, C, w = 5000, 900, 11
    base = (np.arange(n) / n * C).astype(np.int64)
    if local:
        ids = np.clip(base + rng.integers(-30, 30, n), 0, C - 1)
    else:
        ids = rng.integers(0, C, n)
    ids = ids.astype(np.int32)
    ids[3] = -1
    ids[100] = C  # sentinels
    x = rng.standard_normal((n, w)).astype(np.float32)
    windows = pk.plan_fixed_windows(ids, C, width_cap=256)
    if local:
        assert windows is not None
        assert windows[1] * windows[2] <= 512  # narrow: locality found
    if windows is None:
        pytest.skip("no windows for this structure")
    out = pk.windowed_segment_sum(jnp.asarray(x), jnp.asarray(ids), C,
                                  windows, interpret=True)
    ref = np.zeros((C, w), np.float32)
    ok = (ids >= 0) & (ids < C)
    np.add.at(ref, ids[ok], x[ok])
    np.testing.assert_allclose(np.asarray(out)[:C, :w], ref, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("P,C,B,r,tf,te", [
    (300, 260, 2000, 2, 9, 3),    # windowed camera count, BA shapes
    (80, 300, 900, 2, 4, 2),      # non-BA block shapes
])
def test_sj_assembly_windowed_interpret(P, C, B, r, tf, te):
    """Camera-windowed block-diag(S) assembly vs a numpy reference:
    sum over rows of Jsf'Jsf - W' Minv W per camera."""
    rng = np.random.default_rng(P + 3 * C)
    pt = np.sort(rng.integers(0, P, B)).astype(np.int32)
    # camera ids with locality (windows stay narrow like real BA data)
    cam = np.clip((pt.astype(np.int64) * C) // P
                  + rng.integers(-20, 20, B), 0, C - 1).astype(np.int32)
    pt[-3:] = P      # sentinel: constant point block
    cam[5] = C       # sentinel: constant camera block
    Jf = rng.standard_normal((B, r, tf)).astype(np.float32)
    Je = rng.standard_normal((B, r, te)).astype(np.float32)
    Je[pt == P] = 0.0
    Jf[cam >= C] = 0.0
    minv = rng.standard_normal((P, te * te)).astype(np.float32)
    ts, tb, max_rows = pk.plan_row_tiles(pt, P + 1, target_rows=256)
    windows = pk.plan_camera_windows(pt, cam, np.asarray(tb), P, C,
                                     width_cap=256)
    JT, ids_T = pk.prep_matvec_rows(
        jnp.asarray(Jf.reshape(B, -1)), jnp.asarray(Je.reshape(B, -1)),
        jnp.asarray(pt), jnp.asarray(cam), max_rows, r, tf, te)
    BT = pk.BLOCKS_PER_TILE
    gf = max(8, -(-tf // 8) * 8)
    pw = jnp.zeros((P + 1 + BT, 128), jnp.float32)
    pw = pw.at[:P, :te].set(1.0)
    pw = pw.at[:P, 8:8 + te * te].set(jnp.asarray(minv))
    out = pk.sj_assembly_windowed(
        JT, ids_T, pw, jnp.asarray(ts), jnp.asarray(tb), windows,
        P, C, r, tf, te, max_rows=max_rows, interpret=True)
    got = np.asarray(out)[:C].reshape(C, tf, gf)[:, :, :tf]

    ref = np.zeros((C, tf, tf))
    for b in range(B):
        if cam[b] >= C:
            continue
        ftf = sum(np.outer(Jf[b, i], Jf[b, i]) for i in range(r))
        if pt[b] < P:
            W = sum(np.outer(Je[b, i], Jf[b, i]) for i in range(r))
            M = minv[pt[b]].reshape(te, te)
            ftf = ftf - W.T @ M @ W
        ref[cam[b]] += ftf
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=5e-4)
