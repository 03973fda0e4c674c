"""NIST StRD driver CLI (/root/reference/examples/nist.cc)."""
import argparse

from ceres_tpu.models import nist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nist_data_dir", default="/root/reference/data/nist")
    ap.add_argument("--problem", default=None, help="single .dat file name")
    args = ap.parse_args()

    subset = [args.problem] if args.problem else None
    results = nist.run_suite(args.nist_data_dir, subset=subset)
    tiers = {"easy": [], "medium": [], "hard": []}
    tier_of = {f: t for (f, _, _, t) in nist.SUITE}
    total = success = 0
    for fname, runs in results.items():
        for start, (lre, ok) in enumerate(runs):
            status = "SUCCESS" if ok else "FAILURE"
            print(f"{fname:16s} start {start + 1}: {status} lre: {float(lre):5.1f}")
            total += 1
            success += bool(ok)
            tiers[tier_of[fname]].append(bool(ok))
    for t in ("easy", "medium", "hard"):
        if tiers[t]:
            print(f"{t}: {sum(tiers[t])}/{len(tiers[t])}")
    print(f"Total: {success}/{total}")


if __name__ == "__main__":
    main()
