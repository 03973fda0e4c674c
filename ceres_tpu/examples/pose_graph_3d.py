"""3D pose graph SLAM (/root/reference/examples/slam/pose_graph_3d)."""
import argparse

import ceres_tpu as ct
from ceres_tpu.models import pose_graph as pg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="g2o file (synthetic helix if omitted)")
    ap.add_argument("--num_poses", type=int, default=100)
    args = ap.parse_args()
    if args.input:
        poses, constraints = pg.read_g2o_3d(args.input)
    else:
        poses, constraints, _ = pg.synthetic_3d(num_poses=args.num_poses)
    print(f"Number of poses: {len(poses)}; constraints: {len(constraints)}")
    problem, arrays = pg.build_problem_3d(poses, constraints, loss=ct.HuberLoss(1.0))
    summary = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.SPARSE_NORMAL_CHOLESKY,
            max_num_iterations=100,
            minimizer_progress_to_stdout=True,
        ),
        problem,
    )
    print(summary.brief_report())


if __name__ == "__main__":
    main()
