#!/bin/bash
# Babysat 30k longrun: restarts train_eval with --resume whenever the log
# stops advancing for >300 s (TPU tunnel stalls observed ~20-30 min into
# long sessions this round). Checkpoints every 2000 steps bound the loss.
cd "$(dirname "$0")/.."
LOG=outputs/qa_r4_longrun.log
run() {
  python -m thermo_tpu.scripts.train_eval \
    --method thermal-nerf --data outputs/qa_r4/sphere/scene \
    --proposal-fwd-corners 2 --hash-fwd-corners 1 --hash-grad-levels 2 \
    --experiment-name longrun30k-fastps2 \
    --model-output-folder outputs/qa_r4/longrun30k-fastps2 \
    --metrics-output-folder outputs/qa_r4/longrun30k-fastps2/metrics \
    --max-num-iterations 30000 --eval-mode filename --resume >> "$LOG" 2>&1 &
  PID=$!
}
run
for attempt in $(seq 1 12); do
  while kill -0 $PID 2>/dev/null; do
    M1=$(stat -c %Y "$LOG")
    sleep 300
    kill -0 $PID 2>/dev/null || break
    M2=$(stat -c %Y "$LOG")
    if [ "$M1" = "$M2" ]; then
      echo "[babysitter] stall detected (attempt $attempt), restarting with --resume" >> "$LOG"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null; sleep 2
      break
    fi
  done
  # completion = THIS run's evaluator artifacts exist (a "training done"
  # grep on the append-only log would match stale lines from prior runs)
  if ! kill -0 $PID 2>/dev/null \
      && [ -f outputs/qa_r4/longrun30k-fastps2/metrics/metrics.json ]; then
    echo "[babysitter] run completed" >> "$LOG"; exit 0
  fi
  kill -0 $PID 2>/dev/null || run
done
wait $PID
