#!/bin/bash
# Round-5 merged follow-up chip queue (replaces r5b/r5c, which were
# chained in the wrong priority order): after the main queue finishes,
# run the chunked-attention roofline rows FIRST (they complete the
# VERDICT r4 #4 story — is the [T,T] prob HBM traffic the SoL gap?),
# then the MoE roofline/MFU rows.  Same health gate + per-item timeouts
# + .done markers as the other queues.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))

# wait for the main queue to finish (marker) or its runner to exit
while (( $(date +%s) < DEADLINE )); do
  if grep -q "QUEUE COMPLETE" "$LOG/queue.log" 2>/dev/null; then break; fi
  if [ -f /tmp/queue_runner.pid ] && ! ps -p "$(cat /tmp/queue_runner.pid)" >/dev/null 2>&1 \
     && ! ps -eo cmd | grep -q "^bash benchmarks/run_chip_queue_r5.sh"; then break; fi
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
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting (r5d) ---" >> "$LOG/queue.log"
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

# 1) chunked-attention roofline: does removing the [T,T] prob HBM
#    traffic close the speed-of-light gap?
run_item 1200 roofline_19m_T512_chunk128    python benchmarks/decoder_roofline.py 512 6 2048 8 8 512 chunk128
run_item 1200 roofline_19m_T1024_chunk128   python benchmarks/decoder_roofline.py 512 6 2048 8 4 1024 chunk128
run_item 1200 roofline_19m_T512_chunk128_bf16 python benchmarks/decoder_roofline.py 512 6 2048 8 8 512 chunk128 bf16
run_item 1500 roofline_85m_T1024_chunk128   python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024 chunk128

# 2) MoE roofline/MFU rows (VERDICT r4 #4 names the MoE too)
run_item 1200 moeroof_flagship      python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128
run_item 1200 moeroof_T512          python benchmarks/moe_roofline.py 512 6 2048 8 8 8 512
run_item 1200 moeroof_flagship_top1 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 top1
run_item 1200 moeroof_flagship_bf16 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 bf16

echo "=== QUEUE R5D COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
