"""Golden-cost acceptance gate at the REAL bench shape.

The reference asserts final parameters within 1e-4 of a single-thread
DENSE_SCHUR reference across 89 generated configs on BAL problem-16-22106
(bundle_adjustment_test_util.h:30-95, generated_bundle_adjustment_tests/).
No BAL file ships in this image, so the gate runs on the committed
synthetic instance of the same shape (16 cameras, 22106 points, ~83k
observations — bench.py's workload): every solver/preconditioner config
must reach the f64 host-loop DENSE_SCHUR converged cost (bench_golden.json,
value 51931.10068) within 1e-4 relative. Dense-J solvers (DENSE_QR /
DENSE_NORMAL_CHOLESKY) are excluded exactly as the reference's generated
BA tests exclude them: a dense 83k x 66k J is not a BA configuration.
"""
import json
import pathlib

import pytest

import ceres_tpu as ct
from ceres_tpu.models import bal

pytestmark = pytest.mark.slow

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent.parent / "bench_golden.json").read_text()
)["bal16_dense_schur_f64"]


def make_bench_problem():
    n_cams, n_pts = 16, 22106
    vis = 83718 / (n_cams * n_pts)
    b = bal.synthetic_bal(num_cameras=n_cams, num_points=n_pts,
                          visibility=vis, noise=1.0, seed=0)
    b = bal.perturb(b, rotation_sigma=0.02, translation_sigma=0.2,
                    point_sigma=0.2, seed=1)
    return bal.build_problem_batched(b)[0]


CONFIGS = [
    # (solver, preconditioner, fused, dtype, max_iters)
    ("DENSE_SCHUR", "JACOBI", "ALWAYS", "float32", 25),
    ("DENSE_SCHUR", "JACOBI", "NEVER", "float64", 25),
    ("SPARSE_SCHUR", "JACOBI", "NEVER", "float64", 25),
    ("SPARSE_NORMAL_CHOLESKY", "JACOBI", "NEVER", "float64", 25),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "ALWAYS", "float32", 30),
    ("ITERATIVE_SCHUR", "IDENTITY", "ALWAYS", "float32", 30),
    ("ITERATIVE_SCHUR", "SCHUR_POWER_SERIES_EXPANSION", "ALWAYS",
     "float32", 30),
    ("ITERATIVE_SCHUR", "CLUSTER_JACOBI", "ALWAYS", "float32", 30),
    ("ITERATIVE_SCHUR", "CLUSTER_TRIDIAGONAL", "ALWAYS", "float32", 30),
    ("ITERATIVE_SCHUR", "SCHUR_JACOBI", "NEVER", "float64", 30),
    ("CGNR", "JACOBI", "ALWAYS", "float32", 35),
]


@pytest.mark.parametrize("solver,precond,fused,dtype,iters", CONFIGS,
                         ids=[f"{c[0]}-{c[1]}-{c[2]}" for c in CONFIGS])
def test_reaches_golden_cost(solver, precond, fused, dtype, iters):
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType[solver],
        preconditioner_type=ct.PreconditionerType[precond],
        fused_loop=fused,
        evaluation_dtype=dtype,
        max_num_iterations=iters,
        max_linear_solver_iterations=100,
    )
    s = ct.solve(opts, make_bench_problem())
    assert s.is_solution_usable(), s.message
    assert s.final_cost <= GOLDEN * (1 + 1e-4), (
        f"{solver}/{precond}: {s.final_cost} vs golden {GOLDEN}"
    )
