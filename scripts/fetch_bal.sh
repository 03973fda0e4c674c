#!/usr/bin/env bash
# Fetch a BAL dataset (https://grail.cs.washington.edu/projects/bal/) so the
# real-data acceptance gate (tests/test_bal_golden.py::
# test_real_bal_final_parameter_tolerance) can run:
#
#   scripts/fetch_bal.sh [dataset] [outdir]
#   CERES_TPU_BAL_PATH=$outdir/problem-16-22106-pre.txt pytest tests/test_bal_golden.py -k real_bal
#
# Default dataset is the 16-camera Trafalgar problem the reference's 89
# generated BA tests gate on (data/problem-16-22106-pre.txt).
set -euo pipefail
DATASET="${1:-trafalgar/problem-16-22106-pre.txt.bz2}"
OUTDIR="${2:-data}"
BASE="https://grail.cs.washington.edu/projects/bal"
mkdir -p "$OUTDIR"
NAME="$(basename "$DATASET")"
curl -fL "$BASE/data/$DATASET" -o "$OUTDIR/$NAME"
bunzip2 -f "$OUTDIR/$NAME"
echo "export CERES_TPU_BAL_PATH=$OUTDIR/${NAME%.bz2}"
