"""Per-iteration linear-system dumps for offline debugging.

TPU-native equivalent of /root/reference/internal/ceres/
linear_least_squares_problems.{h,cc} DumpLinearLeastSquaresProblem (:84) and
the trust_region_minimizer_iterations_to_dump /
trust_region_problem_dump_directory plumbing (solver.h:725-735,
trust_region_minimizer.cc:387-395). Writes the per-iteration system
(J triplets, D, b, x) as text files `{base}_{A,D,b,x}.txt` plus a loader
for round-tripping in tests.
"""
from __future__ import annotations

import pathlib

import numpy as np


def dump_linear_least_squares_problem(base: str, J, D=None, b=None, x=None):
    """J dense (m, n) or scipy-sparse; D, b, x optional vectors."""
    base = pathlib.Path(base)
    base.parent.mkdir(parents=True, exist_ok=True)
    J = np.asarray(J)
    m, n = J.shape
    rows, cols = np.nonzero(J)
    with open(f"{base}_A.txt", "w") as f:
        f.write(f"{m} {n} {len(rows)}\n")
        for r, c in zip(rows, cols):
            f.write(f"{r} {c} {J[r, c]:.18e}\n")
    for name, v in (("D", D), ("b", b), ("x", x)):
        if v is None:
            continue
        v = np.asarray(v)
        with open(f"{base}_{name}.txt", "w") as f:
            f.write(f"{v.shape[0]}\n")
            for val in v:
                f.write(f"{val:.18e}\n")
    return str(base)


def load_linear_least_squares_problem(base: str):
    """Inverse of dump_...; returns dict with J (dense), D, b, x (or None)."""
    base = pathlib.Path(base)
    out = {}
    with open(f"{base}_A.txt") as f:
        m, n, nnz = (int(v) for v in f.readline().split())
        J = np.zeros((m, n))
        for _ in range(nnz):
            r, c, v = f.readline().split()
            J[int(r), int(c)] = float(v)
    out["J"] = J
    for name in ("D", "b", "x"):
        p = pathlib.Path(f"{base}_{name}.txt")
        if p.exists():
            with open(p) as f:
                k = int(f.readline())
                out[name] = np.asarray([float(f.readline()) for _ in range(k)])
        else:
            out[name] = None
    return out
