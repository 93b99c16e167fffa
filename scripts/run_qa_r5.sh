#!/bin/bash
# Round-5 quality panels (VERDICT r4 items 1, 3, 4).
#
# Batch A — DATA-RICH Pareto rerun (item 1): 150 train views @256px of the
#   "rich" scene, iso-420s. The 24-view scenes' overfit wall
#   (outputs/qa_r4/iso1800) made every round-4 promotion decision
#   overfitting-limited; this regime is the reference's actual use case
#   (30k budget on full-size captures). Panel: exact / fast / f8 (round-5
#   F8-packed proposals) / fastps2 / tpu.
# Batch B — data-rich COLD counterpart: exact / fast / e8.
# Batch C — F8 packing on the round-3/4 sphere protocol (24 views, 128px,
#   cross-round comparable with qa_r4/sphere): f8 / f8g / e8.
# Batch C2 — e8 on the small cold scene (direct compare vs qa_r4/cold
#   exact=13.99 dB / fast=11.53 dB).
# Batch P — polarity mechanism probe (item 4): fast vs exact on "sphereinv"
#   (sphere with ONLY thermal inverted). If fast's cold regression
#   reproduces, inverted content is the mechanism.
set -e
cd "$(dirname "$0")/.."
ISO=${ISO:-420}
OUT=${OUT:-outputs/qa_r5}
RICH="--image-size 256 --num-train 150 --num-eval 6"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/rich" --scene-variant rich --iso-seconds "$ISO" $RICH \
  --variants "exact=0/0,fast=0/0/1/2,f8=0/0/1/2@thermal-nerf-f8,fastps2=0/2/1/2,tpu=0/0/1/2@thermal-nerf-tpu"
echo "=== batch A (rich) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/coldrich" --scene-variant coldrich --iso-seconds "$ISO" $RICH \
  --variants "exact=0/0,fast=0/0/1/2,e8=0/0@thermal-nerf-e8"
echo "=== batch B (coldrich) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/sphere" --scene-variant sphere --iso-seconds "$ISO" \
  --variants "f8=0/0/1/2@thermal-nerf-f8,f8g=0/0/1/2@thermal-nerf-f8g,e8=0/0@thermal-nerf-e8"
echo "=== batch C (sphere) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/cold" --scene-variant cold --iso-seconds "$ISO" \
  --variants "e8=0/0@thermal-nerf-e8"
echo "=== batch C2 (cold) done"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/sphereinv" --scene-variant sphereinv --iso-seconds "$ISO" \
  --variants "exact=0/0,fast=0/0/1/2"
echo "=== batch P (sphereinv) done"

echo "qa_r5 done"
