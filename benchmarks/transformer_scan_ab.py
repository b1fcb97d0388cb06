"""In-process compile + runtime A/B: scanned vs unrolled transformer layers.

The r3 sore spot: the 19M-param transformer's GGN matvec-chain program took
369 s to compile with the blocks unrolled in a Python loop (every layer
traced separately, then replicated across the jvp/vjp phases).  The fix is
``transformer_apply(scan_layers=True)``: stack the per-layer weights and
``lax.scan`` one traced block.

Protocol (single process -- the remote compile service caches subgraphs
WITHIN a process, so ordering matters): the SCANNED variant compiles FIRST
from a cold process; the unrolled variant compiles second and therefore
benefits from any shared cached subgraphs.  That bias favors the unrolled
side, making the scan win a lower bound.  Runtime calls are interleaved
(fresh normalized v0 per call, host transfer forces completion).

Usage: python benchmarks/transformer_scan_ab.py [n_layers] [mode]
  mode: "chain" (default, matvec chain A/B), "step" (full HF step A/B),
        "cold-scan" / "cold-unroll" (ONE variant, cold process -- for
        sampling the remote service's compile-time distribution, which is
        bimodal enough that single A/Bs mislead)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import cross_entropy_loss
from pytorchhessianfree_tpu.models.transformer import (
    init_transformer,
    transformer_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

NUM_MATVECS = 50
D_MODEL, D_FF, HEADS = 512, 2048, 8
VOCAB, T, CLASSES = 1024, 128, 64
BATCH = 32


def build_chain(params, ravel, tokens, labels, scan_layers):
    @jax.jit
    def chain(params, v0):
        _, _, _, gv = ggnvp_fn(
            lambda p: transformer_apply(
                p, tokens, n_heads=HEADS, scan_layers=scan_layers
            ),
            lambda o: cross_entropy_loss(o, labels),
            params,
        )

        def body(_, v):
            w = ravel.ravel(gv(ravel.unravel(v)))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    return chain


def main(n_layers=6, mode="chain"):
    key = jax.random.PRNGKey(0)
    params = init_transformer(
        key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=n_layers,
        d_ff=D_FF, num_classes=CLASSES, max_len=T,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    tokens = jax.random.randint(kx, (BATCH, T), 0, VOCAB)
    labels = jax.random.randint(ky, (BATCH,), 0, CLASSES)
    print(
        f"transformer {n_params / 1e6:.1f}M params, {n_layers} layers, "
        f"b{BATCH} seq{T}, platform {jax.devices()[0].platform}",
        flush=True,
    )

    def fresh_v(i):
        v = jax.random.normal(
            jax.random.PRNGKey(100 + i), (ravel.dim,), jnp.float32
        )
        return v / jnp.linalg.norm(v)

    if mode == "step":
        from pytorchhessianfree_tpu import (
            HFConfig,
            HFModelFns,
            init_state,
            make_hf_step,
        )

        config = HFConfig(damping=1.0, cg_max_iter=50)
        results = {}
        for scan in (True, False):  # scan FIRST: cold-process compile
            fns = HFModelFns(
                model_fn=lambda p, x, s=scan: transformer_apply(
                    p, x, n_heads=HEADS, scan_layers=s
                ),
                loss_outer=cross_entropy_loss,
            )
            # make_hf_step is already jitted inside; re-wrapping it in an
            # outer jax.jit re-traces for nothing and would silently drop
            # donate_argnums if donation were on (see memory_audit r4 fix)
            step = make_hf_step(fns, config, ravel)
            state = init_state(ravel, config)
            t0 = time.perf_counter()
            p2, state, stats = step(params, state, (tokens, labels))
            _ = float(stats.final_loss)
            results[scan] = time.perf_counter() - t0
            print(
                f"full-step compile+first-run scan_layers={scan}: "
                f"{results[scan]:.1f}s (cg {int(stats.num_cg_iters)})",
                flush=True,
            )
            # interleaving runtime below needs both built; store step fns
            results[(scan, "step")] = (step, state)
        for scan in (True, False):
            step, state = results[(scan, "step")]
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                p2, state, stats = step(params, state, (tokens, labels))
                _ = float(stats.final_loss)
                times.append(time.perf_counter() - t0)
            times.sort()
            print(
                f"full-step runtime scan_layers={scan}: "
                f"{times[1] * 1e3:.1f} ms median "
                f"(cg {int(stats.num_cg_iters)})",
                flush=True,
            )
        return

    if mode in ("cold-scan", "cold-unroll"):
        scan = mode == "cold-scan"
        chain = build_chain(params, ravel, tokens, labels, scan)
        t0 = time.perf_counter()
        float(chain(params, fresh_v(0))[0])
        print(
            f"COLD matvec-chain compile+warm scan_layers={scan}: "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        v0 = fresh_v(1)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        float(chain(params, v0)[0])
        print(f"runtime: {(time.perf_counter() - t0) * 1e3 / NUM_MATVECS:.2f}"
              f" ms/matvec", flush=True)
        return

    chains = {}
    for scan in (True, False):  # scan FIRST: cold-process compile
        chain = build_chain(params, ravel, tokens, labels, scan)
        t0 = time.perf_counter()
        float(chain(params, fresh_v(0))[0])
        dt = time.perf_counter() - t0
        chains[scan] = chain
        print(
            f"matvec-chain compile+warm scan_layers={scan}: {dt:.1f}s",
            flush=True,
        )

    # interleaved runtime A/B
    times = {True: [], False: []}
    for i in range(1, 4):
        for scan in (True, False):
            v0 = fresh_v(i)
            jax.block_until_ready(v0)
            t0 = time.perf_counter()
            out = chains[scan](params, v0)
            _ = float(out[0])
            times[scan].append(time.perf_counter() - t0)
    for scan in (True, False):
        ts = sorted(times[scan])
        rate = NUM_MATVECS / ts[1]
        print(
            f"matvec runtime scan_layers={scan}: {rate:.1f}/s "
            f"({1000 / rate:.2f} ms each)",
            flush=True,
        )


if __name__ == "__main__":
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    mode = sys.argv[2] if len(sys.argv) > 2 else "chain"
    main(n_layers, mode)
