#!/bin/bash
# Round-5 closing chain: (1) waits for the e8+anneal rich run (pid $1) that
# closes the "composes with e8 in principle (unmeasured)" claim, then
# (2) fills the last cell of the capacity x regime matrix — thermal-nerf-tiny
# on the DATA-RICH scene. The capacity finding (outputs/qa_r5/RESULTS.md)
# says tiny wins small captures and "the data-rich regime is unaffected";
# that second half is currently inferred, not measured. Expected outcome:
# tiny underfits rich badly (1/16 table budget on 9.8M pixels), which turns
# the <50-view capacity advisory's threshold into a two-sided measurement.
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
echo "=== e8+anneal rich (pid $1) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-tiny --data "$OUT/rich/scene" \
  --experiment-name tiny-rich --model-output-folder "$OUT/tiny-rich" \
  --metrics-output-folder "$OUT/tiny-rich/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename || true
echo "=== tiny capacity probe on rich (420s) done"

echo "qa_r5 phase8 done"
