#!/bin/bash
# Round-5 final-stage chip queue: re-run the 370M OOM probe with the
# head of the "Largest program allocations" dump captured (the first
# capture kept only the error tail, losing the dominant buffers), after
# the r5d queue finishes.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-7200} ))

while (( $(date +%s) < DEADLINE )); do
  if grep -q "QUEUE R5D COMPLETE" "$LOG/queue.log" 2>/dev/null; then break; fi
  if ! ps -eo cmd | grep -q "^bash benchmarks/run_chip_queue_r5d.sh"; then break; fi
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
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting (r5e) ---" >> "$LOG/queue.log"
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

run_item 1500 cap_370m_g2_dump python benchmarks/memory_audit.py mlp_370m_bf16grid_gamma2 25 donate
run_item 1500 cap_370m_g3_dump python benchmarks/memory_audit.py mlp_370m_bf16grid_gamma3 25 donate

echo "=== QUEUE R5E COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
