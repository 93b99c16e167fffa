#!/bin/bash
# Round-5 final batch chain (supersedes phase3/4/5; those were re-planned
# around the observed ~20-min cold-compile of the E1 run and a new
# capacity finding — see RESULTS.md). Order is promotion-critical-first so
# a wall-clock cutoff degrades gracefully:
#   E4  e8 on rich @420s        — the missing row for the F8 promotion call
#   E2  anneal exact on rich    — verdict item 2 lever, data-rich scene
#   E3  anneal fast on sphere   — verdict item 2 lever, small scene
#   T   tiny on sphere @420s    — capacity probe: a CPU repro of the
#       early-stop CLI path showed thermal-nerf-tiny reaching 26.2 dB
#       thermal PSNR on the sphere eval split (vs 19.3 for the best
#       full-capacity variant) — the small-scene panels look
#       capacity-bound, not estimator-bound; this makes it protocol-clean.
#   D   iso-1800s on rich: exact (the "still falling at 1800 s" criterion
#       for the data-rich scene), then e8 (packing robustness at 4.3x
#       budget). exact runs FIRST so a cutoff loses only the e8 leg, whose
#       420 s rows already support the decision. fast/tpu are omitted: the
#       rich 420 s panel pins them 6.8-11.8 dB below exact with
#       variance-bound (not budget-bound) trajectories.
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
echo "=== batch E1 (early stop, sphere 1800s) done (waited on pid $1)"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-e8 --data "$OUT/rich/scene" \
  --experiment-name e8-rich --model-output-folder "$OUT/rich-e8" \
  --metrics-output-folder "$OUT/rich-e8/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename || true
echo "=== batch E4 (e8, rich) done"

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
  --method thermal-nerf-tiny --data "$OUT/sphere/scene" \
  --experiment-name tiny-sphere --model-output-folder "$OUT/tiny-sphere" \
  --metrics-output-folder "$OUT/tiny-sphere/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename || true
echo "=== batch T (tiny capacity probe, sphere 420s) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "exact=0/0" || true
echo "=== batch D1 (iso1800 rich, exact) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "e8=0/0@thermal-nerf-e8" || true
echo "=== batch D2 (iso1800 rich, e8) done"

echo "qa_r5 phase6 done"
