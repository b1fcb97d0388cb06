"""Roofline/MFU accounting for the decoder GGN matvec (VERDICT r4 #4).

The north star says "HVP/GGN matvecs at HBM speed-of-light" (BASELINE.md).
The round-3 accounting closed this for the conv family (~10-15% of bf16
peak with a sound bandwidth-bound explanation); this script produces the
equivalent numbers for the matmul-heavy attention family, where the MXU
CAN fill: exact hand-counted matmul FLOPs + XLA's own flops/bytes-accessed
for ONE amortized GGN matvec on the decoder LMs, vs

- compute roof: 197 TFLOP/s bf16 on a v5e chip (f32 matmuls run as
  bf16-class MXU passes on this part -- measured in the r3 precision A/B);
- bandwidth roof: the MEASURED 613 GB/s streaming ceiling
  (BENCH_DETAILS "bandwidth sweep", ~75% of the 819 GB/s spec).

FLOP model (exact, matmuls only -- elementwise/softmax/layernorm excluded,
so achieved-compute is a slight UNDERestimate): for every primal matmul
``A[m,k] @ W[k,n]`` (2mkn flops), the linearized GGN matvec pays

- jvp: ``dA@W + A@dW``  = 4mkn
- vjp: ``u@W^T + A^T@u`` = 4mkn   (cotangent to both operands)

i.e. exactly 4x the forward's matmul flops; the loss-Hessian application
(softmax diag/outer at every position) is O(b*T*V) elementwise and counted
separately as bytes, not flops.  The linearization itself is amortized
across the whole CG loop (one per batch), matching the optimizer's hot
path (ops/curvature.py::ggnvp_fn) and bench.py's chain.

Usage:
  python benchmarks/decoder_roofline.py [d_model layers d_ff heads batch T]
                                        [bf16] [chunkN] [--cpu]
  # 19.5M decoder @ T=512:  python benchmarks/decoder_roofline.py 512 6 2048 8 8 512
  # 85.9M decoder @ T=1024: python benchmarks/decoder_roofline.py 768 12 3072 12 4 1024
Defaults: the 19.5M decoder (512/6/2048/8) at b8 x T512, f32.
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

BF16_PEAK_TFLOPS = 197.0  # v5e MXU peak (f32 matmuls run bf16-class passes)
MEASURED_STREAM_GBPS = 613.0  # this device, BENCH_DETAILS bandwidth sweep

NUM_MATVECS = 50


def forward_matmul_flops(b, T, d, f, L, V):
    """Exact 2*MAC count of every matmul in one decoder forward.

    Per layer: qkv (2*d*3d), scores QK^T (2*T*d per query), attn@V
    (2*T*d), proj (2*d^2), ff1 (2*d*f), ff2 (2*f*d) -- all per token.
    Tied head: 2*d*V per token.  Embedding is a gather (0 matmul flops).
    """
    per_tok_layer = (
        2 * d * 3 * d      # qkv
        + 2 * T * d        # scores (full masked [T,T] matmul, XLA computes all)
        + 2 * T * d        # probs @ V
        + 2 * d * d        # proj
        + 4 * d * f        # ff1 + ff2
    )
    per_tok = L * per_tok_layer + 2 * d * V
    return b * T * per_tok


def build(d_model, layers, d_ff, heads, batch, T, vocab=1024,
          attn_chunk=None, bf16=False):
    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=vocab, d_model=d_model, n_heads=heads, n_layers=layers,
        d_ff=d_ff, max_len=T,
    )
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    # affine next-token task (same as decoder_lm_bench)
    start = jax.random.randint(key, (batch, 1), 0, vocab)
    toks = [start[:, 0]]
    for _ in range(T - 1):
        toks.append((37 * toks[-1] + 11) % vocab)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)

    def model_fn(p, t):
        return decoder_lm_apply(p, t, n_heads=heads, attn_chunk=attn_chunk)

    cdtype = jnp.bfloat16 if bf16 else None

    def cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(jnp.result_type(a), jnp.floating) else a,
            tree,
        )

    def linearized_gv(params):
        if cdtype is None:
            _, _, _, gv = ggnvp_fn(
                lambda p: model_fn(p, tokens),
                lambda o: next_token_loss(o, tokens),
                params,
            )
            unr = ravel.unravel
        else:
            # the optimizer's bf16 curvature path (optimizer.py
            # _build_matvec_and_grad): model + tangents in bf16, outputs
            # cast back so the loss Hessian stays full precision
            _, _, _, gv = ggnvp_fn(
                lambda p: cast(model_fn(p, tokens), jnp.float32),
                lambda o: next_token_loss(o, tokens),
                cast(params, cdtype),
            )
            unr = lambda v: cast(ravel.unravel(v), cdtype)

        def mv(v):
            return ravel.ravel(
                jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), gv(unr(v))
                )
            )

        return mv

    @jax.jit
    def chain(params, v0):
        """NUM_MATVECS amortized GGN matvecs (one linearization), the same
        program shape as the CG loop's hot path and bench.py's chain."""
        mv = linearized_gv(params)

        def body(_, v):
            w = mv(v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    # straight-line programs for XLA cost accounting (cost_analysis counts
    # a while-loop BODY once, not times its trip count, so the chain's
    # numbers cannot be divided by NUM_MATVECS): per-matvec cost = the
    # (linearize + 1 matvec) program minus the linearize-only program.
    @jax.jit
    def one_mv(params, v):
        return linearized_gv(params)(v)

    @jax.jit
    def lin_only(params, v):
        # keeps only the PRIMAL forward alive (XLA dead-code-eliminates the
        # never-called jvp/vjp), so one_mv - lin_only isolates the matvec's
        # marginal cost: jvp + loss-Hessian apply + vjp
        if cdtype is None:
            loss, _, _, _ = ggnvp_fn(
                lambda p: model_fn(p, tokens),
                lambda o: next_token_loss(o, tokens),
                params,
            )
        else:
            loss, _, _, _ = ggnvp_fn(
                lambda p: cast(model_fn(p, tokens), jnp.float32),
                lambda o: next_token_loss(o, tokens),
                cast(params, cdtype),
            )
        return loss + 0.0 * v[0]

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    return params, ravel, tokens, chain, one_mv, lin_only, n_params


def _cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def run_config(d_model, layers, d_ff, heads, batch, T, attn_chunk, bf16):
    params, ravel, tokens, chain, one_mv, lin_only, n_params = build(
        d_model, layers, d_ff, heads, batch, T,
        attn_chunk=attn_chunk, bf16=bf16,
    )
    vocab = 1024
    fwd_flops = forward_matmul_flops(batch, T, d_model, d_ff, layers, vocab)
    matvec_flops = 4 * fwd_flops

    print(
        f"decoder {n_params / 1e6:.1f}M (d{d_model} L{layers} ff{d_ff} "
        f"h{heads}) b{batch} T{T} "
        f"{'bf16' if bf16 else 'f32'} curvature, attn_chunk {attn_chunk}, "
        f"platform {jax.devices()[0].platform}",
        flush=True,
    )
    print(
        f"hand count: forward {fwd_flops / 1e9:.2f} GFLOP -> GGN matvec "
        f"{matvec_flops / 1e9:.2f} GFLOP (4x, matmuls only)",
        flush=True,
    )

    def fresh_v(i):
        v = jax.random.normal(jax.random.PRNGKey(100 + i), (ravel.dim,),
                              jnp.float32)
        return v / jnp.linalg.norm(v)

    # XLA's own accounting: (linearize + 1 matvec) minus (linearize only),
    # both straight-line programs (cost_analysis counts a while-loop body
    # ONCE, so the chain program cannot be divided by NUM_MATVECS)
    v_probe = fresh_v(0)
    mv_flops_x, mv_bytes_x = _cost(one_mv, params, v_probe)
    lin_flops_x, lin_bytes_x = _cost(lin_only, params, v_probe)
    per_mv_xla_flops = mv_flops_x - lin_flops_x
    per_mv_xla_bytes = mv_bytes_x - lin_bytes_x
    print(
        f"XLA cost_analysis (one_mv - lin_only): "
        f"{per_mv_xla_flops / 1e9:.2f} GFLOP/matvec "
        f"({per_mv_xla_flops / matvec_flops:.2f}x hand count), "
        f"{per_mv_xla_bytes / 1e9:.2f} GB accessed/matvec, "
        f"intensity {per_mv_xla_flops / max(per_mv_xla_bytes, 1):.1f} "
        f"flop/byte",
        flush=True,
    )

    compiled = chain.lower(params, fresh_v(0)).compile()
    t0 = time.perf_counter()
    _ = float(compiled(params, fresh_v(0))[0])
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for i in range(1, 8):
        v0 = fresh_v(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = compiled(params, v0)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    per_mv = med / NUM_MATVECS
    q1, q3 = times[len(times) // 4], times[(3 * len(times)) // 4]

    achieved_tflops = matvec_flops / per_mv / 1e12
    achieved_xla_tflops = per_mv_xla_flops / per_mv / 1e12
    achieved_gbps = per_mv_xla_bytes / per_mv / 1e9
    # which roof binds at this intensity?
    ridge = BF16_PEAK_TFLOPS * 1e12 / (MEASURED_STREAM_GBPS * 1e9)
    intensity = per_mv_xla_flops / max(per_mv_xla_bytes, 1.0)
    bound = "compute" if intensity > ridge else "bandwidth"
    # speed-of-light time at the binding roof
    sol_compute = matvec_flops / (BF16_PEAK_TFLOPS * 1e12)
    sol_bandwidth = per_mv_xla_bytes / (MEASURED_STREAM_GBPS * 1e9)
    sol = max(sol_compute, sol_bandwidth)

    result = {
        "config": f"d{d_model}_L{layers}_ff{d_ff}_h{heads}_b{batch}_T{T}",
        "params_m": round(n_params / 1e6, 1),
        "curvature": "bf16" if bf16 else "f32",
        "attn_chunk": attn_chunk,
        "matvec_ms": round(per_mv * 1e3, 3),
        "iqr_pct": round(100 * (q3 - q1) / med, 1),
        "hand_gflop_per_matvec": round(matvec_flops / 1e9, 2),
        "xla_gflop_per_matvec": round(per_mv_xla_flops / 1e9, 2),
        "xla_gb_per_matvec": round(per_mv_xla_bytes / 1e9, 3),
        "achieved_tflops_hand": round(achieved_tflops, 2),
        "achieved_tflops_xla": round(achieved_xla_tflops, 2),
        "pct_of_bf16_peak": round(100 * achieved_tflops / BF16_PEAK_TFLOPS,
                                  1),
        "achieved_gbps_xla": round(achieved_gbps, 1),
        "pct_of_measured_stream": round(
            100 * achieved_gbps / MEASURED_STREAM_GBPS, 1
        ),
        "intensity_flop_per_byte": round(intensity, 1),
        "ridge_flop_per_byte": round(ridge, 1),
        "bound": bound,
        "speed_of_light_ms": round(sol * 1e3, 3),
        "sol_fraction": round(sol / per_mv, 3),
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    nums = [int(v) for v in sys.argv[1:] if v.isdigit()]
    d_model, layers, d_ff, heads, batch, T = 512, 6, 2048, 8, 8, 512
    if len(nums) >= 6:
        d_model, layers, d_ff, heads, batch, T = nums[:6]
    bf16 = "bf16" in sys.argv
    attn_chunk = None
    for tok in sys.argv[1:]:
        if tok.startswith("chunk") and tok[5:].isdigit():
            attn_chunk = int(tok[5:])

    if "ab" in sys.argv:
        # In-process A/B: the full-attention f32 BASE first, then the
        # flagged variant -- both arms share the relay phase, so the
        # RATIO stays valid even when absolute times are inflated by a
        # slow phase (the relay's bad phase runs 1-2x slower; CLAUDE.md).
        print("--- base: full attention, f32 curvature ---", flush=True)
        base = run_config(d_model, layers, d_ff, heads, batch, T,
                          None, False)
        print(
            f"--- variant: attn_chunk {attn_chunk}, "
            f"{'bf16' if bf16 else 'f32'} curvature ---", flush=True,
        )
        var = run_config(d_model, layers, d_ff, heads, batch, T,
                         attn_chunk, bf16)
        print(json.dumps({
            "ab": True,
            "config": base["config"],
            "base_matvec_ms": base["matvec_ms"],
            "variant_matvec_ms": var["matvec_ms"],
            "variant_over_base": round(
                var["matvec_ms"] / base["matvec_ms"], 3
            ),
        }), flush=True)
        return

    run_config(d_model, layers, d_ff, heads, batch, T, attn_chunk, bf16)


if __name__ == "__main__":
    main()
