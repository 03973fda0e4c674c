"""Fields-of-Experts image denoising CLI
(/root/reference/examples/denoising.cc)."""
import argparse

import numpy as np

import ceres_tpu as ct
from ceres_tpu.models import denoising


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/data/ceres_noisy.pgm")
    ap.add_argument("--foe_file", default="/root/reference/data/2x2.foe")
    ap.add_argument("--output", default="/tmp/ceres_denoised.pgm")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--crop", type=int, default=0, help="optional square crop")
    ap.add_argument("--num_iterations", type=int, default=20)
    args = ap.parse_args()

    foe = denoising.read_foe_file(args.foe_file)
    image = denoising.read_pgm(args.input)
    if args.crop:
        image = image[: args.crop, : args.crop].copy()
    print(f"image {image.shape}, foe {foe.size}x{foe.size} x{foe.num_filters}")
    problem, pixels = denoising.create_problem(foe, image, args.sigma)
    summary = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.CGNR,
            max_num_iterations=args.num_iterations,
            minimizer_progress_to_stdout=True,
        ),
        problem,
    )
    print(summary.brief_report())
    out = denoising.pixels_to_image(pixels)
    denoising.write_pgm(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
