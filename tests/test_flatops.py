"""Flattened-layout products (ops/flatops.py) vs the per-element reference
implementations (ops/partition.py, ops/bsr.py) — must agree to machine
precision, and the wired iterative solvers must keep reference parity."""
import numpy as np
import jax.numpy as jnp

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.program import CompiledProgram
from ceres_tpu.ops import bsr, partition as pt
from ceres_tpu.ops.flatops import FlatJacobianOps, FlatSchurOps
from ceres_tpu.utils import ordering as om
from ceres_tpu.solvers.linear.implicit_schur import (
    build_schur_system,
    schur_multiply,
)


def _setup():
    b = bal.synthetic_bal(
        num_cameras=8, num_points=80, visibility=0.4, noise=0.1, seed=0
    )
    bp = bal.perturb(b, 0.01, 0.05, 0.05, seed=1)
    p, _, _ = bal.build_problem_batched(bp)
    prog = CompiledProgram(p)
    meta = bsr.build_meta(prog)
    o = prog._eval_core(prog.initial_state(), True, False)
    return bp, prog, meta, o["block_jacs"], o["residuals"]


def test_flat_schur_ops_match_partition():
    bp, prog, meta, values, residuals = _setup()
    pm = pt.build_partition(meta, om.eligible_e_sets(prog))
    fo = FlatSchurOps(pm)
    assert fo.supported
    vflat = fo.flatten(values)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(pm.f_size))
    y = jnp.asarray(rng.standard_normal(pm.e_size))
    u = jnp.asarray(rng.standard_normal(meta.num_rows))
    np.testing.assert_allclose(
        fo.right_f(vflat, z), pt.right_multiply_f(pm, values, z), atol=1e-12
    )
    np.testing.assert_allclose(
        fo.right_e(vflat, y), pt.right_multiply_e(pm, values, y), atol=1e-12
    )
    np.testing.assert_allclose(
        fo.left_f(vflat, u), pt.left_multiply_f(pm, values, u), atol=1e-12
    )
    np.testing.assert_allclose(
        fo.left_e(vflat, u), pt.left_multiply_e(pm, values, u), atol=1e-12
    )
    D = jnp.linspace(0.5, 2.0, meta.tangent_size)
    D_e, D_f = pt.extract_e(pm, D), pt.extract_f(pm, D)
    sys = build_schur_system(pm, values, residuals, D_e)
    minvf = fo.minv_flatten(sys.ete_factors)
    np.testing.assert_allclose(
        fo.schur_multiply(vflat, minvf, D_f, z),
        schur_multiply(pm, values, sys, D_f, z),
        rtol=1e-12, atol=1e-12,
    )


def test_flat_jacobian_ops_match_bsr():
    bp, prog, meta, values, residuals = _setup()
    fo = FlatJacobianOps(meta)
    assert fo.supported
    vflat = fo.flatten(values)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(meta.tangent_size))
    u = jnp.asarray(rng.standard_normal(meta.num_rows))
    np.testing.assert_allclose(
        fo.right(vflat, x), bsr.right_multiply(meta, values, x), atol=1e-11
    )
    np.testing.assert_allclose(
        fo.left(vflat, u), bsr.left_multiply(meta, values, u), atol=1e-11
    )
    D = jnp.linspace(0.5, 2.0, meta.tangent_size)
    factors = bsr.factorize_block_diag(bsr.block_diag_jtj(meta, values, D))
    inv_flats = fo.inv_flatten(factors)
    v = jnp.asarray(rng.standard_normal(meta.tangent_size))
    np.testing.assert_allclose(
        fo.inv_apply(inv_flats, v),
        bsr.apply_block_diag_inverse(meta, factors, v),
        atol=1e-12,
    )


def test_flat_paths_reach_reference_cost():
    bp, *_ = _setup()

    def make():
        return bal.build_problem_batched(bp)[0]

    ref = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                   max_num_iterations=20), make()
    )
    for lst in ("CGNR", "ITERATIVE_SCHUR"):
        s = ct.solve(
            ct.Options(linear_solver_type=ct.LinearSolverType.parse(lst),
                       max_num_iterations=20, eta=1e-6), make()
        )
        assert abs(s.final_cost - ref.final_cost) < 1e-5 * max(1.0, ref.final_cost)


def test_flat_mixed_sizes_and_constants():
    """Flat ops on a problem with multiple families, constant blocks and a
    manifold — exercises sentinel rows and non-trivial tangent layout."""
    rng = np.random.default_rng(2)
    q = np.asarray([1.0, 0.0, 0.0, 0.0])
    a = rng.standard_normal(3)
    c = rng.standard_normal(2)
    p = ct.Problem()
    p.add_parameter_block(q, manifold=ct.QuaternionManifold())
    p.add_parameter_block(c)
    p.set_parameter_block_constant(c)

    def r1(qq, aa, d):
        return qq[:3] * aa[0] + aa * d[0]

    def r2(aa, cc):
        return aa[:2] - cc

    cost1 = ct.AutoDiffCostFunction(r1, 3, [4, 3])
    cost2 = ct.AutoDiffCostFunction(r2, 2, [3, 2])
    for i in range(5):
        p.add_residual_block(cost1, None, [q, a], data=(np.float64(i + 1),))
    p.add_residual_block(cost2, None, [a, c])
    prog = CompiledProgram(p)
    meta = bsr.build_meta(prog)
    o = prog._eval_core(prog.initial_state(), True, False)
    values = o["block_jacs"]
    fo = FlatJacobianOps(meta)
    assert fo.supported
    vflat = fo.flatten(values)
    x = jnp.asarray(rng.standard_normal(meta.tangent_size))
    u = jnp.asarray(rng.standard_normal(meta.num_rows))
    np.testing.assert_allclose(
        fo.right(vflat, x), bsr.right_multiply(meta, values, x), atol=1e-12
    )
    np.testing.assert_allclose(
        fo.left(vflat, u), bsr.left_multiply(meta, values, u), atol=1e-12
    )


def test_flat_lane_block_algebra():
    """outer/matmul/transpose/matvec selectors and small SPD inverses vs
    dense numpy on random blocks."""
    from ceres_tpu.ops import flatops as fo

    rng = np.random.default_rng(7)
    for (r, ta, tb) in [(2, 3, 9), (1, 4, 4), (3, 2, 5)]:
        A = rng.standard_normal((11, r, ta))
        B = rng.standard_normal((11, r, tb))
        out = fo.outer_flat(
            jnp.asarray(A.reshape(11, -1)),
            jnp.asarray(B.reshape(11, -1)),
            fo.outer_selectors(r, ta, tb, jnp.float64),
        )
        ref = np.einsum("bra,brc->bac", A, B).reshape(11, -1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)
    for (ti, tk, tj) in [(3, 3, 9), (2, 4, 3)]:
        A = rng.standard_normal((5, ti, tk))
        B = rng.standard_normal((5, tk, tj))
        out = fo.matmul_flat(
            jnp.asarray(A.reshape(5, -1)),
            jnp.asarray(B.reshape(5, -1)),
            fo.matmul_selectors(ti, tk, tj, jnp.float64),
        )
        ref = np.einsum("bik,bkj->bij", A, B).reshape(5, -1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-12)
    M = rng.standard_normal((7, 4, 3))
    out = fo._mm(jnp.asarray(M.reshape(7, -1)), fo.transpose_selector(4, 3, jnp.float64))
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(M, (0, 2, 1)).reshape(7, -1)
    )
    for t in [1, 2, 3, 5]:
        R = rng.standard_normal((9, t, t))
        spd = np.einsum("bik,bjk->bij", R, R) + 3 * np.eye(t)
        inv = fo.spd_inverse_flat(jnp.asarray(spd.reshape(9, -1)), t)
        np.testing.assert_allclose(
            np.asarray(inv).reshape(9, t, t), np.linalg.inv(spd), atol=1e-8
        )
        K = fo.chol_inv_lower_flat(jnp.asarray(spd.reshape(9, -1)), t)
        L = np.linalg.cholesky(spd)
        np.testing.assert_allclose(
            np.asarray(K).reshape(9, t, t), np.linalg.inv(L), atol=1e-8
        )
        x = rng.standard_normal((9, t))
        y = fo.block_matvec_flat(
            jnp.asarray(spd.reshape(9, -1)), jnp.asarray(x), fo.matvec_selectors(t, jnp.float64)
        )
        np.testing.assert_allclose(
            np.asarray(y), np.einsum("bij,bj->bi", spd, x), atol=1e-10
        )


def test_flat_jtj_blocks_and_sqnorm():
    """block_jtj_all / sq_col_norm_all vs bsr dense reference."""
    from ceres_tpu.ops.flatops import FlatJacobianOps

    bp, prog, meta, values, residuals = _setup()
    fl = FlatJacobianOps(meta)
    vflat = fl.flatten(values)
    sqn = np.asarray(fl.sq_col_norm_all(vflat))
    ref = np.asarray(bsr.squared_column_norm(meta, values))
    np.testing.assert_allclose(sqn, ref, rtol=1e-12)
    blocks = fl.block_jtj_all(vflat)
    ref_blocks = bsr.block_diag_jtj(meta, values)
    for (off, nv, t, _), got, want in zip(fl.fams, blocks, ref_blocks):
        np.testing.assert_allclose(
            np.asarray(got).reshape(nv, t, t), np.asarray(want), rtol=1e-10
        )
