#!/bin/bash
# Budget-robustness check: does the iso-420s ordering (fast > fastps2 > tri)
# hold at 4.3x the budget? Runs the three contenders at 1800 s each on the
# sphere scene. fast trains ~3.5k steps, fastps2 ~11k, tri ~15k — if the
# cheapened-proposal variants' extra steps ever catch up, it shows here.
set -e
cd "$(dirname "$0")/.."
python -m thermo_tpu.scripts.quality_ablation \
  --output outputs/qa_r4/iso1800 --scene-variant sphere --iso-seconds 1800 \
  --variants "fast=0/0/1/2,fastps2=0/2/1/2,tri=0/0/1/2@thermal-nerf-tri"
echo "iso1800 done"
