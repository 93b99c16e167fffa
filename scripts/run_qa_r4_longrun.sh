#!/bin/bash
# Full reference-budget (30k iterations, config_thermal_nerf.py:19) long run
# of the fastps2 knob set (exact final-field at eval, stochastic-2 hash
# proposals + ff1gl2) — the fastest fast-class variant that completes 30k
# on one chip inside a round (~77 min at 26.7k rays/s). The promoted
# thermal-nerf-fast preset at 8.6k rays/s needs ~4 h for 30k and the exact
# method ~7.5 h — per-chip infeasible in-round; this run pins whether the
# iso-420s ordering persists at the reference's converged budget.
set -e
cd "$(dirname "$0")/.."
python -m thermo_tpu.scripts.train_eval \
  --method thermal-nerf --data outputs/qa_r4/sphere/scene \
  --proposal-fwd-corners 2 --hash-fwd-corners 1 --hash-grad-levels 2 \
  --experiment-name longrun30k-fastps2 \
  --model-output-folder outputs/qa_r4/longrun30k-fastps2 \
  --metrics-output-folder outputs/qa_r4/longrun30k-fastps2/metrics \
  --max-num-iterations 30000 --eval-mode filename
echo "longrun30k-fastps2 done"
