#!/bin/bash
# Round-5 panels, resumed after the F8 eval-chunk OOM fix (methods.py).
# Per-batch `|| true` so one failure cannot cascade into later batches
# (the original runner died at f8's eval and took batches B..P with it).
cd "$(dirname "$0")/.."
ISO=${ISO:-420}
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

# A2 — complete the data-rich 420s panel (exact/fast already done)
python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/rich" --scene-variant rich --iso-seconds "$ISO" $RICH \
  --variants "f8=0/0/1/2@thermal-nerf-f8,fastps2=0/2/1/2,tpu=0/0/1/2@thermal-nerf-tpu" || true
echo "=== batch A2 (rich remainder) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/coldrich" --scene-variant coldrich --iso-seconds "$ISO" $RICH \
  --variants "exact=0/0,fast=0/0/1/2,e8=0/0@thermal-nerf-e8" || true
echo "=== batch B (coldrich) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/sphere" --scene-variant sphere --iso-seconds "$ISO" \
  --variants "f8=0/0/1/2@thermal-nerf-f8,f8g=0/0/1/2@thermal-nerf-f8g,e8=0/0@thermal-nerf-e8" || true
echo "=== batch C (sphere) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/cold" --scene-variant cold --iso-seconds "$ISO" \
  --variants "e8=0/0@thermal-nerf-e8" || true
echo "=== batch C2 (cold) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/sphereinv" --scene-variant sphereinv --iso-seconds "$ISO" \
  --variants "exact=0/0,fast=0/0/1/2" || true
echo "=== batch P (sphereinv) done"

# E — levers (early stop on the overfit-prone sphere; annealing on the
# scene-appropriate winners; e8 on rich)
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

# D — iso-1800s budget-robustness on the data-rich scene (LAST: longest;
# fastps2 dropped — its 420s row + round-4 data already place it)
python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "exact=0/0,fast=0/0/1/2,tpu=0/0/1/2@thermal-nerf-tpu,e8=0/0@thermal-nerf-e8" || true
echo "=== batch D (iso1800 rich) done"

echo "qa_r5 resume done"
