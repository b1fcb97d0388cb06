#!/bin/bash
# Round-5 chip queue g (after r5f): router-groups lever on the MoE.
# The dispatch/combine tensors are O(G^2/S) elements; at the flagship
# scale (G=4096 tokens, groups=1) they dominate the matvec's HBM bytes
# (13.6 GB/matvec, moe_roofline).  groups=32 (per-sequence) cuts them
# 32x -- the bandwidth-bound matvec should follow.  Same health gate +
# per-item timeouts + .done markers as the other queues.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))

while (( $(date +%s) < DEADLINE )); do
  if grep -q "QUEUE R5F COMPLETE" "$LOG/queue.log" 2>/dev/null; then break; fi
  if ! ps -eo cmd | grep -q "^bash benchmarks/run_chip_queue_r5f.sh"; then break; fi
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
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting (r5g) ---" >> "$LOG/queue.log"
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

# in-process groups=1 vs groups=32 matvec + full-step A/B on the flagship
run_item 2400 moe_groupsab python benchmarks/moe_lm_bench.py groupsab
# roofline accounting for the groups=32 form (bytes + SoL reclassification)
run_item 1200 moeroof_flagship_g32 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 groups32

echo "=== QUEUE R5G COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
