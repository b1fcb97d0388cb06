"""Causal decoder LM evidence row: matvec/s, full-step ms, steps-to-target.

The encoder-classifier transformer pools the sequence into one label; this
workload's loss spans the sequence axis (a softmax GGN block at EVERY
position), so the curvature path through causal attention does real
per-position second-order work -- the standard evidence row for the
"attention family" claim (VERDICT r3 #6).

Task: affine next-token rule tok[t+1] = (a*tok[t] + b) mod V on a 1024-way
vocab -- fully learnable, init loss ln(1024) ~ 6.93.

Usage: python benchmarks/decoder_lm_bench.py [mode]
  mode: "matvec" | "step" | "target" | "all" (default)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    decoder_lm_apply,
    init_decoder_lm,
    next_token_loss,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

NUM_MATVECS = 50
D_MODEL, LAYERS, D_FF, HEADS = 512, 6, 2048, 8
VOCAB, T = 1024, 128
BATCH = 32
REMAT = False
ATTN_CHUNK = None
A, B = 37, 11  # affine rule coefficients (gcd(A, VOCAB)=1 -> a permutation)


def make_batch(key, batch=None):
    batch = BATCH if batch is None else batch  # module global: CLI-overridable
    start = jax.random.randint(key, (batch, 1), 0, VOCAB)
    toks = [start[:, 0]]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens  # (inputs, targets): loss reads raw tokens


_UNSET = object()


def setup(remat=None, attn_chunk=_UNSET):
    remat = REMAT if remat is None else remat
    attn_chunk = ATTN_CHUNK if attn_chunk is _UNSET else attn_chunk
    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS,
        d_ff=D_FF, max_len=T,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    fns = HFModelFns(
        model_fn=lambda p, x, _r=remat, _c=attn_chunk: decoder_lm_apply(
            p, x, n_heads=HEADS, remat=_r, attn_chunk=_c
        ),
        loss_outer=next_token_loss,
    )
    print(
        f"decoder LM {n_params / 1e6:.1f}M params (tied head), b{BATCH} "
        f"seq{T}, remat {remat}, attn_chunk {attn_chunk}, "
        f"platform {jax.devices()[0].platform}",
        flush=True,
    )
    return params, ravel, fns


def bench_matvec(params, ravel, fns):
    tokens, targets = make_batch(jax.random.PRNGKey(1))

    @jax.jit
    def chain(params, v0):
        _, _, _, gv = ggnvp_fn(
            lambda p: fns.model_fn(p, tokens),
            lambda o: next_token_loss(o, targets),
            params,
        )

        def body(_, v):
            w = ravel.ravel(gv(ravel.unravel(v)))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    def fresh_v(i):
        v = jax.random.normal(
            jax.random.PRNGKey(100 + i), (ravel.dim,), jnp.float32
        )
        return v / jnp.linalg.norm(v)

    t0 = time.perf_counter()
    float(chain(params, fresh_v(0))[0])
    print(f"matvec chain compile+warm {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for i in range(1, 6):
        v0 = fresh_v(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = chain(params, v0)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    rate = NUM_MATVECS / times[len(times) // 2]
    print(
        f"GGN matvecs (loss over all {T - 1} positions): {rate:.1f}/s "
        f"({1000 / rate:.2f} ms each)",
        flush=True,
    )


def bench_step(params, ravel, fns, n_steps=5, curvature_dtype=None):
    config = HFConfig(
        damping=1.0, cg_max_iter=50, curvature_dtype=curvature_dtype
    )
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    batch = make_batch(jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    params, state, stats = step(params, state, batch)
    _ = float(stats.final_loss)
    print(f"full-step compile+first {time.perf_counter() - t0:.1f}s "
          f"(cg {int(stats.num_cg_iters)})", flush=True)
    times, iters = [], []
    for i in range(n_steps):
        batch = make_batch(jax.random.fold_in(jax.random.PRNGKey(3), i))
        t0 = time.perf_counter()
        params, state, stats = step(params, state, batch)
        _ = float(stats.final_loss)
        times.append(time.perf_counter() - t0)
        iters.append(int(stats.num_cg_iters))
    times.sort()
    print(
        f"full HF step: {times[len(times) // 2] * 1e3:.1f} ms median "
        f"(cg iters {iters})",
        flush=True,
    )


def bench_target(params, ravel, fns, target=1.0, max_steps=30):
    config = HFConfig(damping=1.0, cg_max_iter=50)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    first = None
    for i in range(max_steps):
        batch = make_batch(jax.random.fold_in(jax.random.PRNGKey(7), i))
        params, state, stats = step(params, state, batch)
        loss = float(stats.init_loss)
        if i == 0:
            first = loss
        print(f"  step {i}: loss {loss:.4f} -> "
              f"{float(stats.final_loss):.4f} "
              f"(cg {int(stats.num_cg_iters)})", flush=True)
        if float(stats.final_loss) < target:
            print(
                f"steps to final-loss<{target}: {i + 1} "
                f"(init {first:.3f})", flush=True,
            )
            return
    print(f"target {target} not reached in {max_steps} steps", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    # optional scale overrides (trailing numbers; flags "remat"/"bf16" go
    # anywhere), e.g. a GPT-2-small-class trunk:
    #   python benchmarks/decoder_lm_bench.py step 768 12 3072 12 16
    # or a long-sequence point (seq is the optional 6th number):
    #   python benchmarks/decoder_lm_bench.py step 512 6 2048 8 4 1024 remat
    nums = [int(v) for v in sys.argv[2:] if v.isdigit()]
    if nums:
        D_MODEL, LAYERS, D_FF, HEADS, BATCH = nums[:5]
        if len(nums) > 5:
            T = nums[5]
    REMAT = "remat" in sys.argv
    for tok in sys.argv[2:]:
        if tok.startswith("chunk") and tok[5:].isdigit():
            ATTN_CHUNK = int(tok[5:])
    if mode == "chunkab":
        # in-process baseline-vs-chunked attention A/B at one config.
        # Baseline = full attention with the CLI's remat flag (pass
        # "remat" to make the baseline the per-layer-remat rescue at
        # sequence lengths where plain full attention OOMs); the chunked
        # variant runs WITHOUT layer remat (the chunk body's own
        # jax.checkpoint already rematerializes attention).  Pass chunkN
        # to pick the chunk size, stepsN for the per-variant step count.
        n_steps = 5
        for tok in sys.argv[2:]:
            if tok.startswith("steps") and tok[5:].isdigit():
                n_steps = int(tok[5:])
        params, ravel, fns = setup(attn_chunk=None)
        print(f"--- full attention (remat {REMAT}) ---", flush=True)
        bench_step(params, ravel, fns, n_steps=n_steps)
        _, _, fns_c = setup(remat=False, attn_chunk=ATTN_CHUNK or 256)
        print(f"--- chunked attention ({ATTN_CHUNK or 256}) ---", flush=True)
        bench_step(params, ravel, fns_c, n_steps=n_steps)
        sys.exit(0)
    if mode == "rematab":
        # in-process remat A/B at one config (cross-process timings drift)
        params, ravel, fns = setup(remat=False)
        print("--- remat OFF ---", flush=True)
        bench_step(params, ravel, fns)
        _, _, fns_r = setup(remat=True)
        print("--- remat ON ---", flush=True)
        bench_step(params, ravel, fns_r)
        sys.exit(0)
    params, ravel, fns = setup()
    if mode in ("matvec", "all"):
        bench_matvec(params, ravel, fns)
    if mode in ("step", "all"):
        bench_step(
            params, ravel, fns,
            curvature_dtype="bfloat16" if "bf16" in sys.argv else None,
        )
    if mode in ("target", "all"):
        bench_target(params, ravel, fns)
