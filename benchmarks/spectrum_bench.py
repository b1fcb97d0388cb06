"""Spectral-diagnostics cost at scale: Lanczos/Ritz on the decoder GGN.

Shows the beyond-reference spectrum tooling (ops/spectrum.py) is usable at
real model scale: one jitted program linearizes the decoder once and runs a
k-step Lanczos with full reorthogonalization on the live GGN matvec.

What to expect: the marginal cost per Lanczos iteration ~= one amortized
GGN matvec plus two [k, n] reorth matmuls (n = flat dim, so the reorth adds
~4*k*n flops + a [k,n] basis resident in HBM -- k*n*4 bytes, e.g. 2.5 GB at
k=32 on the 19.5M decoder).  Reported: lambda_max with its Kaniel-Paige
residual bound, total wall-clock, per-iteration ms vs the bare matvec-chain
per-matvec ms from decoder_roofline at the same config.

Usage:
  python benchmarks/spectrum_bench.py [d_model layers d_ff heads batch T k]
                                      [--cpu]
Defaults: 19.5M decoder (512/6/2048/8) at b8 x T512, k=32.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    decoder_lm_apply,
    init_decoder_lm,
    next_token_loss,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn
from pytorchhessianfree_tpu.ops.spectrum import normalized_probes, ritz


def main():
    nums = [int(v) for v in sys.argv[1:] if v.isdigit()]
    d_model, layers, d_ff, heads, batch, T, k = 512, 6, 2048, 8, 8, 512, 32
    if len(nums) >= 7:
        d_model, layers, d_ff, heads, batch, T, k = nums[:7]

    key = jax.random.PRNGKey(0)
    vocab = 1024
    params = init_decoder_lm(
        key, vocab=vocab, d_model=d_model, n_heads=heads, n_layers=layers,
        d_ff=d_ff, max_len=T,
    )
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    start = jax.random.randint(key, (batch, 1), 0, vocab)
    toks = [start[:, 0]]
    for _ in range(T - 1):
        toks.append((37 * toks[-1] + 11) % vocab)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(
        f"decoder {n_params / 1e6:.1f}M b{batch} T{T} k={k} "
        f"(basis {k * ravel.dim * 4 / 1e9:.2f} GB), "
        f"platform {jax.devices()[0].platform}",
        flush=True,
    )

    @jax.jit
    def run(params, v0):
        _, _, _, gv = ggnvp_fn(
            lambda p: decoder_lm_apply(p, tokens, n_heads=heads),
            lambda o: next_token_loss(o, tokens),
            params,
        )

        def mv(v):
            return ravel.ravel(gv(ravel.unravel(v)))

        return ritz(mv, v0, k)

    v0s = normalized_probes(
        jax.random.PRNGKey(7), 4, ravel.unpadded_dim, jnp.float32,
        pad_to=ravel.dim if ravel.dim != ravel.unpadded_dim else None,
    )
    t0 = time.perf_counter()
    compiled = run.lower(params, v0s[0]).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = compiled(params, v0s[0])
    lam_max = float(res.values[0])  # host transfer forces completion
    warm_s = time.perf_counter() - t0
    print(f"compile {compile_s:.1f}s warm {warm_s:.2f}s", flush=True)

    times = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        r = compiled(params, v0s[i])
        lam = float(r.values[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    result = {
        "config": f"d{d_model}_L{layers}_ff{d_ff}_h{heads}_b{batch}_T{T}",
        "params_m": round(n_params / 1e6, 1),
        "k": k,
        "lambda_max": round(lam_max, 6),
        "lambda_max_residual_bound": float(res.residual_bounds[0]),
        "lambda_min_ritz": float(res.values[-1]),
        "total_ms": round(med * 1e3, 1),
        "per_iter_ms": round(med * 1e3 / k, 3),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
