"""MoE decoder LM evidence row: matvec/s, full-step ms, steps-to-target.

The sparse-expert analog of ``decoder_lm_bench.py``: same affine
next-token task, but the FFNs are top-2 routed experts (models/moe.py) --
at the default scale (d512/L6/ff2048/E8) the expert tensors hold ~100M
parameters of which ~2/8 are active per token, so this measures the HF
pipeline on a model whose PARAMETER count is capacity-class while its
per-token FLOPs stay decoder-class.

Usage: python benchmarks/moe_lm_bench.py [mode] [d l ff heads b [T [E]]]
  mode: "matvec" | "step" | "target" | "all" (default)
        "topkab"    in-process top-2 vs top-1 (Switch) step A/B
        "capab"     in-process capacity 1.25 vs 0.5 (token-dropping) A/B
        "groupsab"  in-process router_groups 1 vs BATCH step A/B (the
                    dispatch/combine tensors are O(G^2/S) -- per-sequence
                    grouping cuts their HBM traffic BATCHx)
        "sustained" scanned on-device train loop (one dispatch per K steps)
  flags anywhere: "remat", "bf16" (curvature dtype), "chunkN" (attention),
        "capX.X" (capacity_factor), "top1", "groupsN" (router groups),
        "stepsN" (timed steps per variant)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    init_moe_decoder_lm,
    moe_decoder_lm_apply,
    next_token_loss,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

NUM_MATVECS = 20
D_MODEL, LAYERS, D_FF, HEADS = 512, 6, 2048, 8
VOCAB, T, EXPERTS = 1024, 128, 8
BATCH = 32
REMAT = False
ATTN_CHUNK = None
TOP_K = 2
CAPACITY_FACTOR = 1.25
ROUTER_GROUPS = 1
A, B = 37, 11


def make_batch(key, batch=None):
    batch = BATCH if batch is None else batch
    start = jax.random.randint(key, (batch, 1), 0, VOCAB)
    toks = [start[:, 0]]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens


def setup(top_k=None, capacity_factor=None, router_groups=None,
          quiet=False):
    top_k = TOP_K if top_k is None else top_k
    capacity_factor = (
        CAPACITY_FACTOR if capacity_factor is None else capacity_factor
    )
    router_groups = ROUTER_GROUPS if router_groups is None else router_groups
    key = jax.random.PRNGKey(0)
    params = init_moe_decoder_lm(
        key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS,
        d_ff=D_FF, n_experts=EXPERTS, max_len=T,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    n_expert = sum(
        blk[k].size for blk in params["blocks"]
        for k in ("w1", "b1", "w2", "b2")
    )
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(
            p, t, n_heads=HEADS, remat=REMAT, attn_chunk=ATTN_CHUNK,
            top_k=top_k, capacity_factor=capacity_factor,
            router_groups=router_groups,
        ),
        loss_outer=next_token_loss,
    )
    if not quiet:
        print(
            f"MoE decoder {n_params / 1e6:.1f}M params "
            f"({n_expert / 1e6:.1f}M in {EXPERTS} experts, "
            f"top-{top_k} active, capacity {capacity_factor}, "
            f"groups {router_groups}), "
            f"b{BATCH} seq{T}, remat {REMAT}, attn_chunk {ATTN_CHUNK}, "
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
        f"GGN matvecs (routed experts, loss over all positions): "
        f"{rate:.1f}/s ({1000 / rate:.2f} ms each)",
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
    ts = sorted(times)
    med = ts[len(ts) // 2]
    iqr = 100 * (ts[(3 * len(ts)) // 4] - ts[len(ts) // 4]) / med
    per_iter = sorted(t / max(i, 1) for t, i in zip(times, iters))
    print(
        f"full HF step: {med * 1e3:.1f} ms median (IQR {iqr:.1f}%), "
        f"{per_iter[len(per_iter) // 2] * 1e3:.2f} ms/cg-iter "
        f"(cg iters {iters})",
        flush=True,
    )
    return med, iters


def bench_sustained(params, ravel, fns, loop_len=10, n_loops=3):
    """Scanned on-device train loop (one dispatch per loop_len steps) --
    the deployment shape; reports sustained ms/step over the later loops
    (the first is compile+warm)."""
    from pytorchhessianfree_tpu import make_hf_train_loop

    config = HFConfig(damping=1.0, cg_max_iter=50)
    loop = make_hf_train_loop(fns, config, ravel)
    state = init_state(ravel, config)

    def stacked(key):
        bs = [make_batch(jax.random.fold_in(key, i)) for i in range(loop_len)]
        xs = jnp.stack([b[0] for b in bs])
        ys = jnp.stack([b[1] for b in bs])
        return xs, ys

    t0 = time.perf_counter()
    params, state, stats = loop(params, state, stacked(jax.random.PRNGKey(4)))
    _ = float(stats.final_loss[-1])
    print(f"scan-loop compile+first({loop_len} steps) "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    rates = []
    for i in range(n_loops):
        batches = stacked(jax.random.fold_in(jax.random.PRNGKey(5), i))
        jax.block_until_ready(batches[0])
        t0 = time.perf_counter()
        params, state, stats = loop(params, state, batches)
        _ = float(stats.final_loss[-1])
        dt = time.perf_counter() - t0
        rates.append(dt / loop_len)
        print(
            f"  loop {i}: {dt:.2f}s = {dt / loop_len * 1e3:.1f} ms/step "
            f"(cg iters {[int(v) for v in stats.num_cg_iters]})",
            flush=True,
        )
    rates.sort()
    med = rates[len(rates) // 2]
    print(
        f"sustained: {med * 1e3:.1f} ms/step median = "
        f"{BATCH / med:.0f} sequences/s ({BATCH * T / med:,.0f} tokens/s)",
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
    nums = [int(v) for v in sys.argv[2:] if v.isdigit()]
    if nums:
        D_MODEL, LAYERS, D_FF, HEADS, BATCH = nums[:5]
        if len(nums) > 5:
            T = nums[5]
        if len(nums) > 6:
            EXPERTS = nums[6]
    REMAT = "remat" in sys.argv
    n_steps = 5
    for tok in sys.argv[2:]:
        if tok.startswith("chunk") and tok[5:].isdigit():
            ATTN_CHUNK = int(tok[5:])
        if tok.startswith("cap"):
            try:
                CAPACITY_FACTOR = float(tok[3:])
            except ValueError:
                pass
        if tok == "top1":
            TOP_K = 1
        if tok.startswith("groups") and tok[6:].isdigit():
            ROUTER_GROUPS = int(tok[6:])
        if tok.startswith("steps") and tok[5:].isdigit():
            n_steps = int(tok[5:])
    if mode == "topkab":
        # in-process top-2 vs top-1 (Switch) full-step A/B: same params,
        # same batches, only the routing differs
        params, ravel, fns2 = setup(top_k=2)
        print("--- top-2 routing ---", flush=True)
        bench_step(params, ravel, fns2, n_steps=n_steps)
        _, _, fns1 = setup(top_k=1, quiet=True)
        print("--- top-1 (Switch) routing ---", flush=True)
        bench_step(params, ravel, fns1, n_steps=n_steps)
        sys.exit(0)
    if mode == "groupsab":
        # in-process router-groups A/B: global routing (groups=1, the
        # single-program GShard form whose [G, E, C] dispatch/combine
        # tensors dominate the matvec's HBM bytes at this scale) vs
        # per-sequence routing (groups=BATCH: same capacity PER TOKEN,
        # O(G^2/S) dispatch memory cut BATCHx).  Routing semantics differ
        # only in which tokens compete for slots, so cg-iter trajectories
        # show whether convergence cares.
        params, ravel, fns_g1 = setup(router_groups=1)
        print("--- router_groups 1 (global) ---", flush=True)
        bench_matvec(params, ravel, fns_g1)
        bench_step(params, ravel, fns_g1, n_steps=n_steps)
        _, _, fns_gb = setup(router_groups=BATCH, quiet=True)
        print(f"--- router_groups {BATCH} (per-sequence) ---", flush=True)
        bench_matvec(params, ravel, fns_gb)
        bench_step(params, ravel, fns_gb, n_steps=n_steps)
        sys.exit(0)
    if mode == "capab":
        # in-process capacity A/B: 1.25 (few drops) vs 0.5 (heavy
        # token-dropping regime -- capacity well under the routed load)
        params, ravel, fns_hi = setup(capacity_factor=1.25)
        print("--- capacity_factor 1.25 ---", flush=True)
        bench_step(params, ravel, fns_hi, n_steps=n_steps)
        _, _, fns_lo = setup(capacity_factor=0.5, quiet=True)
        print("--- capacity_factor 0.5 (dropping) ---", flush=True)
        bench_step(params, ravel, fns_lo, n_steps=n_steps)
        sys.exit(0)
    params, ravel, fns = setup()
    if mode in ("matvec", "all"):
        bench_matvec(params, ravel, fns)
    if mode in ("step", "all"):
        bench_step(
            params, ravel, fns,
            curvature_dtype="bfloat16" if "bf16" in sys.argv else None,
            n_steps=n_steps,
        )
    if mode == "sustained":
        bench_sustained(params, ravel, fns)
    if mode in ("target", "all"):
        bench_target(params, ravel, fns)
