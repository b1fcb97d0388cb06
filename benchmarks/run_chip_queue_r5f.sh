#!/bin/bash
# Round-5 follow-up chip queue (after r5e): compose the two measured
# levers — chunked attention + bf16 curvature — at T=1024 (the regime
# where chunking wins −37%), and extend the T-invariance claim one rung
# to T=2048 at fixed token count.  Same health gate + per-item timeouts
# + .done markers as the other queues.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))

# wait for the r5e queue to finish (marker) or its runner to exit
while (( $(date +%s) < DEADLINE )); do
  if grep -q "QUEUE R5E COMPLETE" "$LOG/queue.log" 2>/dev/null; then break; fi
  if ! ps -eo cmd | grep -q "^bash benchmarks/run_chip_queue_r5e.sh"; then break; fi
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
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting (r5f) ---" >> "$LOG/queue.log"
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

# 1) chunk x bf16 composition at T=1024 (expected best absolute rows)
run_item 1200 roofline_19m_T1024_chunk128_bf16 python benchmarks/decoder_roofline.py 512 6 2048 8 4 1024 chunk128 bf16
run_item 1500 roofline_85m_T1024_chunk128_bf16 python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024 chunk128 bf16

# 2) T=2048 at fixed 4096 tokens: does per-token cost stay T-invariant?
run_item 1200 roofline_19m_T2048_chunk256      python benchmarks/decoder_roofline.py 512 6 2048 8 2 2048 chunk256
run_item 1500 roofline_85m_T2048_chunk256      python benchmarks/decoder_roofline.py 768 12 3072 12 2 2048 chunk256

echo "=== QUEUE R5F COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
