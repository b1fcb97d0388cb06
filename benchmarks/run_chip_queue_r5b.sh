#!/bin/bash
# Round-5 follow-up chip queue: waits for the main queue
# (run_chip_queue_r5.sh) to finish, then runs the MoE roofline/MFU rows
# (VERDICT r4 #4 named the decoders AND the MoE) with the same health
# gate + per-item timeouts.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-14400} ))

# wait for the main queue to finish (marker line) or its runner to exit
while (( $(date +%s) < DEADLINE )); do
  if grep -q "QUEUE COMPLETE" "$LOG/queue.log" 2>/dev/null; then break; fi
  if [ -f /tmp/queue_runner.pid ] && ! kill -0 "$(cat /tmp/queue_runner.pid)" 2>/dev/null; then break; fi
  sleep 60
done

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x)[0, 0]) == 256.0
EOF
}

wait_healthy() {
  while (( $(date +%s) < DEADLINE )); do
    if probe; then return 0; fi
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting (r5b) ---" >> "$LOG/queue.log"
    sleep 90
  done
  return 1
}

run_item() {
  local t=$1 name=$2; shift 2
  if [ -s "$LOG/$name.log" ] && grep -q "." "$LOG/$name.done" 2>/dev/null; then
    echo "=== $name already done, skipping ===" >> "$LOG/queue.log"
    return 0
  fi
  if ! wait_healthy; then
    echo "=== $name SKIPPED: queue deadline, relay still down ===" >> "$LOG/queue.log"
    return 99
  fi
  echo "=== $name START $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
  [ $rc -eq 0 ] && echo ok > "$LOG/$name.done"
  return $rc
}

# MoE roofline rows: the bench flagship (113M, b32 T128), a T512 row, and
# the top-1 (Switch) comparison on the flagship shape.
run_item 1200 moeroof_flagship      python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128
run_item 1200 moeroof_T512          python benchmarks/moe_roofline.py 512 6 2048 8 8 8 512
run_item 1200 moeroof_flagship_top1 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 top1
run_item 1200 moeroof_flagship_bf16 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 bf16

echo "=== QUEUE R5B COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
