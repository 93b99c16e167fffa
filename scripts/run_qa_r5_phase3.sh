#!/bin/bash
# Round-5 remaining batches (resume #2): the E lever runs and a trimmed
# iso-1800s budget-robustness panel. tpu is dropped from iso1800 — its
# 420 s row (12.47 dB, eval minimum at step 280 then 2.8x rise) already
# places it far off the data-rich Pareto; spending 1800 s of the final
# round's budget to reconfirm a dominated variant is not worth it.
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

rm -rf "$OUT/earlystop" "$OUT/anneal-rich" "$OUT/anneal-sphere" "$OUT/rich-e8"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-fast --data "$OUT/sphere/scene" \
  --experiment-name es-fast --model-output-folder "$OUT/earlystop" \
  --metrics-output-folder "$OUT/earlystop/metrics" \
  --max-num-iterations 1000000 --max-seconds 1800 \
  --steps-per-eval-batch 100 --early-stop-patience 5 --eval-mode filename || true
echo "=== batch E1 (early stop, sphere 1800s) done"

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
  --variants "exact=0/0,fast=0/0/1/2,e8=0/0@thermal-nerf-e8" || true
echo "=== batch D (iso1800 rich, trimmed) done"

echo "qa_r5 phase3 done"
