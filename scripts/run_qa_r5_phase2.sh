#!/bin/bash
# Round-5 phase 2 (after run_qa_r5.sh):
#   Batch D — iso-1800s rerun of the four presets on the DATA-RICH scene
#     (VERDICT r4 item 1: budget-robustness where budgets bind; the eval
#     trajectories at 250-step cadence are the no-overfit evidence).
#   Batch E — the round-5 levers (item 2), measured:
#     E1: early stopping on the overfit-prone 24-view sphere scene at the
#         1800 s budget (qa_r4 iso1800 fast WITHOUT early stop degraded to
#         17.43 dB vs its own 420 s 19.30 — early stop should recover the
#         peak and bank the rest of the budget).
#     E2/E3: late-training sample-count annealing on the fast preset at
#         iso-420s on rich + sphere (anneal at step 400 to (128,48)/24 —
#         half the per-ray sample traffic).
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "exact=0/0,fast=0/0/1/2,fastps2=0/2/1/2,tpu=0/0/1/2@thermal-nerf-tpu,e8=0/0@thermal-nerf-e8"
echo "=== batch D (iso1800 rich) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-fast --data "$OUT/sphere/scene" \
  --experiment-name es-fast --model-output-folder "$OUT/earlystop" \
  --metrics-output-folder "$OUT/earlystop/metrics" \
  --max-num-iterations 1000000 --max-seconds 1800 \
  --steps-per-eval-batch 100 --early-stop-patience 5 --eval-mode filename
echo "=== batch E1 (early stop, sphere 1800s) done"

# E2: annealing on the scene-appropriate quality winner — EXACT on the
# data-rich scene (Batch A: exact 24.31 dB >> fast 17.50 — the stochastic
# estimators flip from winner to 6.8 dB loser when the overfit wall stops
# binding), FAST on the 24-view sphere (round-4 winner there).
python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf --data "$OUT/rich/scene" \
  --experiment-name "anneal-exact-rich" \
  --model-output-folder "$OUT/anneal-rich" \
  --metrics-output-folder "$OUT/anneal-rich/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename \
  --anneal-step 150 --anneal-proposal-samples 128 48 --anneal-nerf-samples 24
echo "=== batch E anneal (exact, rich) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-fast --data "$OUT/sphere/scene" \
  --experiment-name "anneal-fast-sphere" \
  --model-output-folder "$OUT/anneal-sphere" \
  --metrics-output-folder "$OUT/anneal-sphere/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename \
  --anneal-step 400 --anneal-proposal-samples 128 48 --anneal-nerf-samples 24
echo "=== batch E anneal (fast, sphere) done"

# E4: the exact-estimator F8-packed preset on the data-rich scene — with
# the estimator flip, e8 (5.6k rays/s, exact numerics, packed grids) is the
# quality-speed candidate in this regime.
python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-e8 --data "$OUT/rich/scene" \
  --experiment-name "e8-rich" \
  --model-output-folder "$OUT/rich-e8" \
  --metrics-output-folder "$OUT/rich-e8/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename
echo "=== batch E4 (e8, rich) done"

echo "qa_r5 phase2 done"
