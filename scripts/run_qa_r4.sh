#!/bin/bash
# Round-4 iso-wall-clock quality ablation across 3 scene variants.
#
# Variants (all at 420 s post-compile budget, the round-3 protocol):
#   exact     — reference-parity numerics (anchor)
#   fast      — thermal-nerf-fast (ff1gl2 knobs, round-3 quality winner)
#   tri       — thermal-nerf-tri (ff1gl2 + triplane proposals, round-4 lever)
#   fastps2   — fast + stochastic hash proposals (proposal_fwd_corners=2)
#   tpu       — thermal-nerf-tpu (throughput flagship, quality reference)
#
# The sphere scene runs the full panel; cold/multi run the promotion
# candidates (exact/fast/tri) so per-scene ordering is measured on >= 3
# scenes (round-3 verdict item 5).
set -e
cd "$(dirname "$0")/.."
ISO=${ISO:-420}
OUT=${OUT:-outputs/qa_r4}

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/sphere" --scene-variant sphere --iso-seconds "$ISO" \
  --variants "exact=0/0,fast=0/0/1/2,tri=0/0/1/2@thermal-nerf-tri,tri4=0/0/1/2@thermal-nerf-tri4,fastps2=0/2/1/2"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/cold" --scene-variant cold --iso-seconds "$ISO" \
  --variants "exact=0/0,fast=0/0/1/2,tri=0/0/1/2@thermal-nerf-tri"

python -m thermo_tpu.scripts.quality_ablation \
  --output "$OUT/multi" --scene-variant multi --iso-seconds "$ISO" \
  --variants "exact=0/0,fast=0/0/1/2,tri=0/0/1/2@thermal-nerf-tri"

echo "qa_r4 done"
