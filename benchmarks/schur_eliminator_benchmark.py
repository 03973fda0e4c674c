"""Schur elimination + reduced-solve benchmark.

Equivalent of /root/reference/internal/ceres/schur_eliminator_benchmark.cc
and dense_linear_solver_benchmark.cc: time the DENSE_SCHUR and SPARSE_SCHUR
assemble+factor+backsubstitute steps and the full ITERATIVE_SCHUR solve on
synthetic BAL problems of increasing size.
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8x500,16x2000,32x4000")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ceres_tpu.models import bal
    from ceres_tpu.ops import bsr, partition as pt
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.solvers.linear.dense_schur import dense_schur_solve
    from ceres_tpu.solvers.linear.implicit_schur import iterative_schur_solve
    from ceres_tpu.solvers.linear.sparse_schur import SparseSchurSolver
    from ceres_tpu.utils.ordering import eligible_e_sets

    def timeit(fn, *a, n=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    for spec in args.sizes.split(","):
        nc, npnt = (int(v) for v in spec.split("x"))
        b = bal.synthetic_bal(num_cameras=nc, num_points=npnt, visibility=0.3,
                              noise=0.5, seed=0)
        problem, _, _ = bal.build_problem(b)
        prog = CompiledProgram(problem)
        x = prog.initial_state()
        _, res, _, values = prog.evaluate_bsr(x)
        meta = bsr.build_meta(prog)
        pm = pt.build_partition(meta, eligible_e_sets(prog))
        D = jnp.ones(prog.tangent_size)
        print(f"# {nc} cams x {npnt} pts ({b.num_observations} obs), "
              f"f_size={pm.f_size}, e_size={pm.e_size}")

        f_dense = jax.jit(lambda v, r: dense_schur_solve(pm, v, r, D))
        t = timeit(f_dense, values, res)
        print(f"  dense_schur_solve      {t*1e3:9.2f} ms")

        sss = SparseSchurSolver(pm)
        t0 = time.perf_counter()
        sss.solve(values, res, D)
        t1 = time.perf_counter()
        n = 5
        for _ in range(n):
            sss.solve(values, res, D)
        t = (time.perf_counter() - t1) / n
        print(f"  sparse_schur_solve     {t*1e3:9.2f} ms (first {((t1-t0))*1e3:.0f} ms)")

        f_isc = jax.jit(
            lambda v, r: iterative_schur_solve(
                pm, v, r, D, q_tolerance=0.1, max_num_iterations=100
            )[0]
        )
        t = timeit(f_isc, values, res)
        print(f"  iterative_schur_solve  {t*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
