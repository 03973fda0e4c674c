"""Ellipse approximation by a closed line-segment contour
(/root/reference/examples/ellipse_approximation.cc): jointly optimize the
contour control points X and the per-data-point preimage positions t.

The purpose (as in the reference) is to demonstrate `dynamic_sparsity`:
each residual depends on the WHOLE control-point block, but at any
evaluation point only the two control points bracketing floor(t) have
nonzero Jacobian entries — the problem is numerically dense but
dynamically sparse, so DYNAMIC_SPARSE re-runs the symbolic analysis on
the actual per-iteration pattern.

TPU-idiomatic modelling: the contour is ONE (num_segments*2,) parameter
block (the reference passes all 151 blocks to every residual; a single
block keeps the kind batched and the dynamic-sparsity pattern explicit),
and the preimage positions are one block per data point.
"""
import argparse
import time

import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def generate_ellipse(num_points: int, seed: int = 1337) -> np.ndarray:
    """Points on a rotated 4:1 ellipse with angular jitter (the data
    recipe documented in the reference example's comment)."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0.0, 2.0 * np.pi, num_points, endpoint=False)
    t += 2.0 * np.pi * 0.01 * rng.randn(t.size)
    theta = np.deg2rad(15)
    a, b = np.cos(theta), np.sin(theta)
    R = np.array([[a, -b], [b, a]])
    return np.c_[4.0 * np.cos(t), np.sin(t)] @ R.T


def build_problem(Y: np.ndarray, num_segments: int,
                  regularization_weight: float = 1e-2):
    n = num_segments
    # control points start on the unit circle
    w = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    X = np.stack([np.cos(w), np.sin(w)], axis=1).reshape(-1)  # (n*2,)
    # preimage positions start at the closest control point index
    d2 = ((X.reshape(n, 2)[None, :, :] - Y[:, None, :]) ** 2).sum(-1)
    t = np.argmin(d2, axis=1).astype(np.float64)

    problem = ct.Problem()

    def point_to_contour(tb, Xb, data):
        """Distance from data point y to the contour position at
        preimage tb: interpolate between the bracketing control points
        (PointToLineSegmentContourCostFunction's model)."""
        y = data
        tt = tb[0]
        tt = tt - n * jnp.floor(tt / n)
        i0 = jnp.floor(tt).astype(jnp.int32) % n
        i1 = (i0 + 1) % n
        u = tt - jnp.floor(tt)
        x0 = jnp.stack([Xb[2 * i0], Xb[2 * i0 + 1]])
        x1 = jnp.stack([Xb[2 * i1], Xb[2 * i1 + 1]])
        p = (1.0 - u) * x0 + u * x1
        return y - p

    cost = ct.AutoDiffCostFunction(point_to_contour, 2, [1, 2 * n],
                                   name="point_to_contour")
    ts = [np.array([ti]) for ti in t]
    for i in range(Y.shape[0]):
        problem.add_residual_block(cost, None, [ts[i], X],
                                   data=jnp.asarray(Y[i]))

    sqrt_w = np.sqrt(regularization_weight)

    def seg_length(Xb):
        """Regularize total contour length: all segment vectors at once
        (one kind instead of n two-block residuals)."""
        P = Xb.reshape(n, 2)
        return (sqrt_w * (jnp.roll(P, -1, axis=0) - P)).reshape(-1)

    reg = ct.AutoDiffCostFunction(seg_length, 2 * n, [2 * n],
                                  name="contour_length")
    problem.add_residual_block(reg, None, [X])
    return problem, X, ts


def solve(problem, dynamic: bool, max_iters: int):
    opts = ct.Options(
        linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
        dynamic_sparsity=dynamic,
        max_num_iterations=max_iters,
    )
    t0 = time.time()
    s = ct.solve(opts, problem)
    return s, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_points", type=int, default=212)
    ap.add_argument("--num_segments", type=int, default=151)
    ap.add_argument("--max_num_iterations", type=int, default=100)
    args = ap.parse_args()

    Y = generate_ellipse(args.num_points)

    for dynamic in (True, False):
        problem, X, ts = build_problem(Y, args.num_segments)
        s, dt = solve(problem, dynamic, args.max_num_iterations)
        print(f"dynamic_sparsity = {dynamic}")
        print(s.brief_report())
        print(f"wall time {dt:.2f}s")


if __name__ == "__main__":
    main()
