"""More-Garbow-Hillstrom test-problem driver.

TPU-native equivalent of /root/reference/examples/more_garbow_hillstrom.cc
(:550-640): solves MGH problems 1-19 from initial_x * 10^trial for
trials 0..2, unconstrained and (where certified) bounds-constrained,
scoring >= 4 relative log digits on the sum of squares.

Usage: python -m ceres_tpu.examples.more_garbow_hillstrom [--problem N]
       [--trials 0,1,2] [--constrained]
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", type=int, default=None,
                    help="single problem number (default: all)")
    ap.add_argument("--trials", default="0",
                    help="comma-separated start scalings 10^t")
    ap.add_argument("--constrained", action="store_true")
    args = ap.parse_args()

    from ceres_tpu.models import mgh

    trials = tuple(int(t) for t in args.trials.split(","))
    problems = [p for p in mgh.PROBLEMS
                if args.problem is None or p.number == args.problem]
    total = successes = 0
    for p in problems:
        if args.constrained and p.constrained_optimal_cost is None:
            continue
        for t in trials:
            ok, achieved, s = mgh.solve_problem(p, args.constrained, t)
            total += 1
            successes += ok
            print(f"MGH {p.number:2d} {p.name:22s} trial {t}: "
                  f"{'Yes' if ok else 'No '}  2*cost={achieved:.6g} "
                  f"({s.termination_type}, {len(s.iterations)} it)")
    print(f"{successes}/{total} successes "
          f"({'constrained' if args.constrained else 'unconstrained'})")


if __name__ == "__main__":
    main()
