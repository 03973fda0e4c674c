"""Preconditioner tests: exact CLUSTER_TRIDIAGONAL (batched block-tridiagonal
Cholesky along cluster chains) vs a dense solve of the restricted Schur
complement, plus the solver-level preconditioner matrix
(visibility_based_preconditioner_test.cc / iterative_schur_complement*_test.cc
patterns)."""
import numpy as np
import jax.numpy as jnp
import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal
from ceres_tpu.program import CompiledProgram
from ceres_tpu.ops import bsr, partition as pt
from ceres_tpu.utils import ordering
from ceres_tpu.solvers.linear.implicit_schur import (
    build_schur_system,
    schur_multiply,
)
from ceres_tpu.solvers.linear.preconditioners import (
    ClusterBlockAssembler,
    ClusterStructure,
    make_cluster_preconditioner,
    make_cluster_tridiagonal_preconditioner,
)


def _ba_setup(nc=8, npts=60, seed=0):
    b = bal.synthetic_bal(
        num_cameras=nc, num_points=npts, visibility=0.5, noise=0.05, seed=seed
    )
    bp = bal.perturb(b, 0.01, 0.05, 0.05, seed=seed + 1)
    p, _, _ = bal.build_problem_batched(bp)
    prog = CompiledProgram(p)
    meta = bsr.build_meta(prog)
    e_fams = ordering.eligible_e_sets(prog)
    pm = pt.build_partition(meta, e_fams)
    x = prog.initial_state()
    o = prog._eval_core(x, True, False)
    return prog, meta, pm, o["block_jacs"], o["residuals"]


def _dense_restricted_schur(pm, values, residuals, D, cs):
    """Dense damped S restricted to within-cluster + chain-edge camera
    pairs (the matrix CLUSTER_TRIDIAGONAL is supposed to invert)."""
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)
    sys = build_schur_system(pm, values, residuals, D_e)
    n = pm.f_size
    S = np.column_stack(
        [
            np.asarray(
                schur_multiply(pm, values, sys, D_f, jnp.eye(n)[:, j])
            )
            for j in range(n)
        ]
    )
    C = len(cs.cluster_indices)
    loc = np.full(n, -1)
    for ci, idx in enumerate(cs.cluster_indices):
        loc[idx] = ci
    allowed = loc[:, None] == loc[None, :]
    for c in range(C):
        pa = cs.parent_of[c] if cs.chains is not None else -1
        if pa >= 0:
            a = loc[:, None] == c
            b = loc[None, :] == pa
            allowed |= (a & b) | (a & b).T
    return np.where(allowed, S, 0.0)


def test_cluster_tridiagonal_exact_solve():
    """apply(v) == solve(restricted S, v) for a hand-built 4-cluster chain."""
    prog, meta, pm, values, residuals = _ba_setup(nc=8)
    num_f = sum(nv for (_, nv, _, _) in pm.f_fams)
    membership = np.arange(num_f) % 4
    forest = [(0, 1), (1, 2), (2, 3)]
    cs = ClusterStructure(pm, membership, forest)
    assert cs.chains is not None and len(cs.chains) == 1
    assembler = ClusterBlockAssembler(pm, cs)

    D = jnp.full((pm.base.tangent_size,), 1.0)
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)
    precond = make_cluster_tridiagonal_preconditioner(
        cs, lambda: assembler(values, D_e, D_f)
    )
    R = _dense_restricted_schur(pm, values, residuals, D, cs)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(pm.f_size)
    np.testing.assert_allclose(
        np.asarray(precond(jnp.asarray(v))), np.linalg.solve(R, v), rtol=1e-8
    )


def test_cluster_tridiagonal_empty_forest_matches_jacobi():
    """No forest edges -> tridiagonal path degenerates to cluster-Jacobi."""
    prog, meta, pm, values, residuals = _ba_setup(nc=6, npts=40, seed=2)
    num_f = sum(nv for (_, nv, _, _) in pm.f_fams)
    membership = np.arange(num_f) % 3
    D = jnp.full((pm.base.tangent_size,), 1.0)
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)

    cs_t = ClusterStructure(pm, membership, [])
    asm_t = ClusterBlockAssembler(pm, cs_t)
    tri = make_cluster_tridiagonal_preconditioner(
        cs_t, lambda: asm_t(values, D_e, D_f)
    )
    cs_j = ClusterStructure(pm, membership, None)
    asm_j = ClusterBlockAssembler(pm, cs_j)
    jac = make_cluster_preconditioner(cs_j, lambda: asm_j(values, D_e, D_f))

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(pm.f_size))
    np.testing.assert_allclose(np.asarray(tri(v)), np.asarray(jac(v)), rtol=1e-9)


@pytest.mark.parametrize(
    "precond",
    [
        "JACOBI",
        "SCHUR_JACOBI",
        "SCHUR_POWER_SERIES_EXPANSION",
        "CLUSTER_JACOBI",
        "CLUSTER_TRIDIAGONAL",
    ],
)
def test_iterative_schur_preconditioner_matrix(precond):
    """Every preconditioner reaches the DENSE_SCHUR final cost."""

    def make():
        b = bal.synthetic_bal(
            num_cameras=6, num_points=50, visibility=0.5, noise=0.1, seed=7
        )
        bp = bal.perturb(b, 0.01, 0.05, 0.05, seed=8)
        return bal.build_problem_batched(bp)[0]

    ref = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
            max_num_iterations=25,
        ),
        make(),
    )
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ct.PreconditionerType.parse(precond),
            max_num_iterations=25,
            eta=1e-4,
        ),
        make(),
    )
    assert s.is_solution_usable()
    assert s.final_cost < ref.final_cost * 1.05 + 1e-10
