#!/bin/bash
# Round-5 consolidated remainder queue (replaces the r5e/r5f/r5g chain
# after an external cleanup killed the earlier runners mid-outage):
#   1) chunk x bf16 composition at T=1024 + T=2048 T-invariance rows
#   2) MoE router-groups A/B (groups=1 vs 32) + g32 roofline row
#   3) 370M OOM probes with the dominant-buffer dump head captured
# Idempotent via .done markers (already-captured items are skipped).
#
# STRICTER health gate than r5d-g: the relay has a degraded phase where
# a trivial matmul takes ~70 s but still completes -- timings taken there
# are not comparable with the morning's rows.  The probe now requires the
# import+matmul round trip under 45 s (good phase: ~10-20 s import + ~2 s
# matmul), so items only run when the relay is actually fast.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))

probe() {
  timeout 45 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x)[0, 0]) == 256.0
EOF
}

wait_healthy() {
  while (( $(date +%s) < DEADLINE )); do
    if probe; then return 0; fi
    echo "--- relay unhealthy/slow $(date -u +%H:%M:%S), waiting (r5h) ---" >> "$LOG/queue.log"
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

# 1) MoE router-groups lever first (the round's biggest open perf claim)
run_item 2400 moe_groupsab python benchmarks/moe_lm_bench.py groupsab
run_item 1200 moeroof_flagship_g32 python benchmarks/moe_roofline.py 512 6 2048 8 8 32 128 groups32

# 2) chunk x bf16 composition + T=2048 rows
run_item 1200 roofline_19m_T1024_chunk128_bf16 python benchmarks/decoder_roofline.py 512 6 2048 8 4 1024 chunk128 bf16
run_item 1500 roofline_85m_T1024_chunk128_bf16 python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024 chunk128 bf16
run_item 1200 roofline_19m_T2048_chunk256      python benchmarks/decoder_roofline.py 512 6 2048 8 2 2048 chunk256
run_item 1500 roofline_85m_T2048_chunk256      python benchmarks/decoder_roofline.py 768 12 3072 12 2 2048 chunk256

# 3) 370M OOM dominant-buffer dumps (compile-only outcome; timing-insensitive)
run_item 1500 cap_370m_g2_dump python benchmarks/memory_audit.py mlp_370m_bf16grid_gamma2 25 donate
run_item 1500 cap_370m_g3_dump python benchmarks/memory_audit.py mlp_370m_bf16grid_gamma3 25 donate

echo "=== QUEUE R5H COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
