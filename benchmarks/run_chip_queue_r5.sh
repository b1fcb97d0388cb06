#!/bin/bash
# Round-5 chip-bound evidence queue (VERDICT r4 items #1/#2/#4/#5/#6 +
# queued spectrum row).  Sequential: ONE TPU job at a time, each under a
# hard timeout so a relay hang can't wedge the queue.
#
# The relay goes FULLY unresponsive for an hour+ (CLAUDE.md); the health
# gate therefore WAITS patiently — probe every ~3 min until healthy or the
# global queue deadline passes — rather than burning per-item retries on a
# dead relay.
set -u
cd /root/repo
LOG=benchmarks/logs_r5
mkdir -p "$LOG"
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-14400} ))  # default 4 h

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
    echo "--- relay unhealthy $(date -u +%H:%M:%S), waiting ---" >> "$LOG/queue.log"
    sleep 90
  done
  return 1
}

run_item() {  # run_item <timeout_s> <logname> <cmd...>
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

# 1. Driver-metric refresh: updates BENCH_LAST_GOOD.json on success so even
#    a round-end outage carries fresh numbers (VERDICT #1).
run_item 2500 bench python bench.py

# 2. MoE TPU evidence row (VERDICT #2): matvec/s + step ms + steps-to-target.
run_item 1800 moe_all python benchmarks/moe_lm_bench.py all

# 3. Decoder roofline/MFU accounting (VERDICT #4): 19.5M + 85.9M decoders,
#    T=512/1024, f32 + bf16 curvature.
run_item 900  roofline_19m_T512_f32   python benchmarks/decoder_roofline.py 512 6 2048 8 8 512
run_item 900  roofline_19m_T512_bf16  python benchmarks/decoder_roofline.py 512 6 2048 8 8 512 bf16
run_item 900  roofline_19m_T1024_f32  python benchmarks/decoder_roofline.py 512 6 2048 8 4 1024
run_item 1200 roofline_85m_T512_f32   python benchmarks/decoder_roofline.py 768 12 3072 12 8 512
run_item 1200 roofline_85m_T1024_f32  python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024
run_item 1200 roofline_85m_T1024_bf16 python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024 bf16

# 4. Single-chip capacity rungs past 235M (VERDICT #6): gamma-grid configs.
run_item 1500 cap_302m_g2 python benchmarks/memory_audit.py mlp_300m_bf16grid_gamma2 25 donate
run_item 1500 cap_302m_g3 python benchmarks/memory_audit.py mlp_300m_bf16grid_gamma3 25 donate
run_item 1500 cap_370m_g2 python benchmarks/memory_audit.py mlp_370m_bf16grid_gamma2 25 donate

# 5. In-process T=8192 chunk-vs-remat A/B (VERDICT #5): baseline =
#    per-layer-remat full attention (plain full attention OOMs at T8192),
#    variant = chunked attention; identical CG trajectories in one process.
run_item 3000 chunkab_T8192 python benchmarks/decoder_lm_bench.py chunkab 512 6 2048 8 2 8192 remat chunk256 steps3

# 6. MoE in-process A/Bs + sustained loop (VERDICT #2 rigor).
run_item 1500 moe_topkab    python benchmarks/moe_lm_bench.py topkab
run_item 1500 moe_capab     python benchmarks/moe_lm_bench.py capab
run_item 1500 moe_sustained python benchmarks/moe_lm_bench.py sustained

# 7. Spectral-diagnostics cost row (queued after the main queue).
run_item 900 spectrum python benchmarks/spectrum_bench.py

echo "=== QUEUE COMPLETE $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
