#!/bin/bash
# Isolate fast's cold-scene regression: ff1 alone (0/0/1/0) vs gl2 alone
# (1/0/0/2 = grad-corner+level subsampling with exact forward) at iso-420s
# on the cold scene. Compare against qa_r4/cold exact (13.99/0.1414) and
# fast = ff1+gl2 (11.53/0.182).
set -e
cd "$(dirname "$0")/.."
python -m thermo_tpu.scripts.quality_ablation \
  --output outputs/qa_r4/coldprobe --scene-variant cold --iso-seconds 420 \
  --variants "ff1=0/0/1/0,gc1gl2=1/0/0/2"
echo "coldprobe done"
