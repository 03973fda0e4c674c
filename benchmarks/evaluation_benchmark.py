"""Residual/Jacobian evaluation + linear-operator benchmarks.

Equivalent of /root/reference/internal/ceres/evaluation_benchmark.cc
(:242-755: BAL-driven residual/Jacobian eval, PartitionedMatrixView
products, implicit-Schur products, preconditioner updates) on a synthetic
BAL instance. Prints one line per benchmark: name, ms/op, and derived
throughput.
"""
import argparse
import time

import numpy as np


def timeit(fn, *args, n=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bal_file", default=None)
    ap.add_argument("--num_cameras", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=4000)
    ap.add_argument("--f64", action="store_true", help="run in float64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ceres_tpu.models import bal
    from ceres_tpu.ops import bsr, partition as pt
    from ceres_tpu.program import CompiledProgram
    from ceres_tpu.utils.ordering import eligible_e_sets

    if args.bal_file:
        b = bal.read_bal_file(args.bal_file)
    else:
        b = bal.synthetic_bal(num_cameras=args.num_cameras,
                              num_points=args.num_points, visibility=0.25,
                              noise=1.0, seed=0)
    print(f"# cameras={b.num_cameras} points={b.num_points} obs={b.num_observations}")
    problem, _, _ = bal.build_problem(b)
    prog = CompiledProgram(problem)
    x = prog.initial_state()
    nnz = b.num_observations * 2 * 12

    t = timeit(prog.evaluate_residuals, x)
    print(f"residuals_only            {t*1e3:9.3f} ms  {b.num_observations/t/1e6:8.1f} Mobs/s")
    t = timeit(prog.evaluate_bsr, x)
    print(f"residuals_and_jacobian    {t*1e3:9.3f} ms  {b.num_observations/t/1e6:8.1f} Mobs/s")

    _, _, _, values = prog.evaluate_bsr(x)
    meta = bsr.build_meta(prog)
    v = jnp.ones(prog.tangent_size)
    u = jnp.ones(prog.num_residuals)
    f_rm = jax.jit(lambda vals, v: bsr.right_multiply(meta, vals, v))
    f_lm = jax.jit(lambda vals, u: bsr.left_multiply(meta, vals, u))
    t = timeit(f_rm, values, v)
    print(f"bsr_right_multiply (J v)  {t*1e3:9.3f} ms  {nnz/t/1e9:8.2f} Gnnz/s")
    t = timeit(f_lm, values, u)
    print(f"bsr_left_multiply (J'u)   {t*1e3:9.3f} ms  {nnz/t/1e9:8.2f} Gnnz/s")

    pm = pt.build_partition(meta, eligible_e_sets(prog))
    ve = jnp.ones(pm.e_size)
    vf = jnp.ones(pm.f_size)
    t = timeit(jax.jit(lambda vals, z: pt.right_multiply_f(pm, vals, z)), values, vf)
    print(f"pmv_right_multiply_f      {t*1e3:9.3f} ms")
    t = timeit(jax.jit(lambda vals, y: pt.right_multiply_e(pm, vals, y)), values, ve)
    print(f"pmv_right_multiply_e      {t*1e3:9.3f} ms")
    t = timeit(jax.jit(lambda vals, u: pt.left_multiply_f(pm, vals, u)), values, u)
    print(f"pmv_left_multiply_f       {t*1e3:9.3f} ms")

    from ceres_tpu.solvers.linear.implicit_schur import (
        build_schur_system,
        make_schur_jacobi_preconditioner,
        schur_multiply,
    )

    D = jnp.ones(prog.tangent_size)
    D_e = pt.extract_e(pm, D)
    D_f = pt.extract_f(pm, D)
    f_sys = jax.jit(lambda vals, r: build_schur_system(pm, vals, r, D_e))
    sys = f_sys(values, u)
    jax.block_until_ready(sys.rhs)
    t = timeit(f_sys, values, u)
    print(f"implicit_schur_setup      {t*1e3:9.3f} ms")
    f_mul = jax.jit(lambda vals, z: schur_multiply(pm, vals, sys, D_f, z))
    t = timeit(f_mul, values, vf)
    print(f"implicit_schur_multiply   {t*1e3:9.3f} ms")
    f_prec = jax.jit(
        lambda vals: make_schur_jacobi_preconditioner(pm, vals, sys, D_f)(vf)
    )
    t = timeit(f_prec, values)
    print(f"schur_jacobi_update+apply {t*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
