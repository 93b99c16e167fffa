#!/bin/bash
# Round-5 last chain (supersedes phase6 after observing that the compile
# cache is per-process: every train_eval invocation pays 5-20 min of
# remote cold-compile, blowing the phase6 ETA). Must-haves first; the
# tiny TPU protocol run and the e8@1800 leg are LAST as
# time-permitting extras (their findings already have supporting
# evidence: CPU capacity probes, e8's three 420 s rows).
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
echo "=== batch E4 (e8, rich) done (waited on pid $1)"

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

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "exact=0/0" || true
echo "=== batch D1 (iso1800 rich, exact) done"

python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf-tiny --data "$OUT/sphere/scene" \
  --experiment-name tiny-sphere --model-output-folder "$OUT/tiny-sphere" \
  --metrics-output-folder "$OUT/tiny-sphere/metrics" \
  --max-num-iterations 1000000 --max-seconds 420 \
  --steps-per-eval-batch 250 --eval-mode filename || true
echo "=== batch T (tiny capacity probe, sphere 420s) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/iso1800" --scene-variant rich --iso-seconds 1800 $RICH \
  --variants "e8=0/0@thermal-nerf-e8" || true
echo "=== batch D2 (iso1800 rich, e8) done"

echo "qa_r5 phase7 done"
