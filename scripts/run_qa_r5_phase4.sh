#!/bin/bash
# Round-5 final batches. Waits for the in-flight E1 early-stop run (PID $1)
# to finish, then runs E2-E4 and a promotion-critical iso-1800s pair.
# iso1800 is trimmed to exact vs e8: fast's budget behavior is already
# pinned by its rich 420 s row (-6.8 dB, estimator-variance-bound — more
# steps cannot remove a noise floor the tpu preset's 8,020-step run proves
# out) and by the round-4 sphere iso-1800 panel; the OPEN question is
# whether e8's exact-class quality at 1.22x throughput survives a 4.3x
# budget on the data-rich scene.
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
echo "=== batch E1 (early stop, sphere 1800s) done (waited on pid $1)"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf --data "$OUT/rich/scene" \
  --experiment-name anneal-exact-rich --model-output-folder "$OUT/anneal-rich" \
  --metrics-output-folder "$OUT/anneal-rich/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename \
  --anneal-step 150 --anneal-proposal-samples 128 48 --anneal-nerf-samples 24 || true
echo "=== batch E2 (anneal exact, rich) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-fast --data "$OUT/sphere/scene" \
  --experiment-name anneal-fast-sphere --model-output-folder "$OUT/anneal-sphere" \
  --metrics-output-folder "$OUT/anneal-sphere/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename \
  --anneal-step 400 --anneal-proposal-samples 128 48 --anneal-nerf-samples 24 || true
echo "=== batch E3 (anneal fast, sphere) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-e8 --data "$OUT/rich/scene" \
  --experiment-name e8-rich --model-output-folder "$OUT/rich-e8" \
  --metrics-output-folder "$OUT/rich-e8/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename || true
echo "=== batch E4 (e8, rich) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "exact=0/0,e8=0/0@thermal-nerf-e8" || true
echo "=== batch D (iso1800 rich, exact vs e8) done"

echo "qa_r5 phase4 done"
