"""Roofline/MFU accounting for the MoE-decoder GGN matvec (VERDICT r4 #4).

Companion to ``decoder_roofline.py`` for the sparse-expert family: exact
hand-counted matmul/einsum FLOPs + XLA's own flops/bytes for ONE amortized
GGN matvec on the top-k MoE causal decoder (models/moe.py), vs the same
two roofs (197 TFLOP/s bf16 MXU peak; the measured 613 GB/s stream).

FLOP model (exact, matmuls/einsums only): the GShard dispatch formulation
makes routing itself a set of dense einsums, so the hand count covers

- attention (same as the dense decoder): qkv, scores, probs@V, proj;
- router gate: ``sgd,de->sge``            = 2*G*d*E
- dispatch:    ``sgec,sgd->secd``         = 2*G*E*C*d
- expert MLP:  ``secd,edf->secf`` + back  = 4*S*E*C*d*f
- combine:     ``sgec,secd->sgd``         = 2*G*E*C*d
- tied head:   2*d*V per token

with G = b*T tokens, S router groups, C = ceil(cf * k * (G/S) / E) slots.
The GGN matvec pays at most 4x the forward's flops (jvp 2x + vjp 2x, see
decoder_roofline.py's derivation); for the MoE the 4x is an UPPER bound:
the 0/1 dispatch tensor is piecewise-constant in the router probabilities
(zero tangent through argmax/one_hot), so XLA dead-code-eliminates the
``d(dispatch)@x`` jvp terms -- expect xla_gflop < hand_gflop and read
``achieved_tflops_xla`` as the honest MFU numerator.
Note the dispatch/combine einsums are O(G * E * C * d) = O(cf*k*G^2*d/S)
-- at groups=1 they can rival the expert MLPs; the printed breakdown shows
the split so the router-groups knob's flop effect is visible.

Usage:
  python benchmarks/moe_roofline.py [d_model layers d_ff heads experts batch T]
                                    [top1] [groupsN] [bf16] [chunkN] [--cpu]
Defaults: d512 L6 ff1024 h8 E8 b8 T512 top-2 groups=1 (a ~45M-param MoE
whose ACTIVE per-token compute matches the 19.5M dense decoder).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import next_token_loss
from pytorchhessianfree_tpu.models.moe import (
    init_moe_decoder_lm,
    moe_decoder_lm_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

BF16_PEAK_TFLOPS = 197.0
MEASURED_STREAM_GBPS = 613.0

NUM_MATVECS = 50
CAPACITY_FACTOR = 1.25


def forward_flops(b, T, d, f, L, V, E, top_k, groups, cf=CAPACITY_FACTOR):
    """Exact 2*MAC count of every matmul/einsum in one MoE forward.

    Returns (total, attention_part, router_part, expert_part) -- router =
    gate + dispatch + combine einsums, expert = the batched expert MLPs.
    """
    G = b * T
    Gg = G // groups
    C = int(math.ceil(cf * top_k * Gg / E))
    per_tok_attn = 2 * d * 3 * d + 2 * T * d + 2 * T * d + 2 * d * d
    attn = b * T * L * per_tok_attn + b * T * 2 * d * V  # + tied head
    router = L * (2 * G * d * E + 2 * G * E * C * d + 2 * G * E * C * d)
    expert = L * (4 * groups * E * C * d * f)
    return attn + router + expert, attn, router, expert


def build(d_model, layers, d_ff, heads, n_experts, batch, T, vocab=1024,
          top_k=2, groups=1, attn_chunk=None, bf16=False):
    key = jax.random.PRNGKey(0)
    params = init_moe_decoder_lm(
        key, vocab=vocab, d_model=d_model, n_heads=heads, n_layers=layers,
        d_ff=d_ff, n_experts=n_experts, max_len=T,
    )
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    start = jax.random.randint(key, (batch, 1), 0, vocab)
    toks = [start[:, 0]]
    for _ in range(T - 1):
        toks.append((37 * toks[-1] + 11) % vocab)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)

    def model_fn(p, t):
        return moe_decoder_lm_apply(
            p, t, n_heads=heads, capacity_factor=CAPACITY_FACTOR,
            router_groups=groups, top_k=top_k, attn_chunk=attn_chunk,
        )

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
        mv = linearized_gv(params)

        def body(_, v):
            w = mv(v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    @jax.jit
    def one_mv(params, v):
        return linearized_gv(params)(v)

    @jax.jit
    def lin_only(params, v):
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


def main():
    nums = [int(v) for v in sys.argv[1:] if v.isdigit()]
    d_model, layers, d_ff, heads, n_experts, batch, T = (
        512, 6, 1024, 8, 8, 8, 512
    )
    if len(nums) >= 7:
        d_model, layers, d_ff, heads, n_experts, batch, T = nums[:7]
    bf16 = "bf16" in sys.argv
    top_k = 1 if "top1" in sys.argv else 2
    groups = 1
    attn_chunk = None
    for tok in sys.argv[1:]:
        if tok.startswith("groups") and tok[6:].isdigit():
            groups = int(tok[6:])
        if tok.startswith("chunk") and tok[5:].isdigit():
            attn_chunk = int(tok[5:])

    params, ravel, tokens, chain, one_mv, lin_only, n_params = build(
        d_model, layers, d_ff, heads, n_experts, batch, T,
        top_k=top_k, groups=groups, attn_chunk=attn_chunk, bf16=bf16,
    )
    vocab = 1024
    fwd, attn_f, router_f, expert_f = forward_flops(
        batch, T, d_model, d_ff, layers, vocab, n_experts, top_k, groups
    )
    matvec_flops = 4 * fwd

    print(
        f"moe {n_params / 1e6:.1f}M (d{d_model} L{layers} ff{d_ff} "
        f"h{heads} E{n_experts} top{top_k} groups{groups}) b{batch} T{T} "
        f"{'bf16' if bf16 else 'f32'} curvature, attn_chunk {attn_chunk}, "
        f"platform {jax.devices()[0].platform}",
        flush=True,
    )
    print(
        f"hand count: forward {fwd / 1e9:.2f} GFLOP "
        f"(attn {100 * attn_f / fwd:.0f}% router {100 * router_f / fwd:.0f}% "
        f"expert {100 * expert_f / fwd:.0f}%) -> GGN matvec "
        f"{matvec_flops / 1e9:.2f} GFLOP (4x, matmuls/einsums only)",
        flush=True,
    )

    def fresh_v(i):
        v = jax.random.normal(jax.random.PRNGKey(100 + i), (ravel.dim,),
                              jnp.float32)
        return v / jnp.linalg.norm(v)

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
    ridge = BF16_PEAK_TFLOPS * 1e12 / (MEASURED_STREAM_GBPS * 1e9)
    intensity = per_mv_xla_flops / max(per_mv_xla_bytes, 1.0)
    bound = "compute" if intensity > ridge else "bandwidth"
    # speed-of-light from XLA's counts (what the device actually executes
    # after the dispatch-tangent DCE), not the hand upper bound
    sol_compute = per_mv_xla_flops / (BF16_PEAK_TFLOPS * 1e12)
    sol_bandwidth = per_mv_xla_bytes / (MEASURED_STREAM_GBPS * 1e9)
    sol = max(sol_compute, sol_bandwidth)

    result = {
        "config": (
            f"moe_d{d_model}_L{layers}_ff{d_ff}_h{heads}_E{n_experts}"
            f"_top{top_k}_g{groups}_b{batch}_T{T}"
        ),
        "params_m": round(n_params / 1e6, 1),
        "curvature": "bf16" if bf16 else "f32",
        "matvec_ms": round(per_mv * 1e3, 3),
        "iqr_pct": round(100 * (q3 - q1) / med, 1),
        "hand_gflop_per_matvec": round(matvec_flops / 1e9, 2),
        "hand_split_pct": {
            "attn": round(100 * attn_f / fwd, 1),
            "router": round(100 * router_f / fwd, 1),
            "expert": round(100 * expert_f / fwd, 1),
        },
        "xla_gflop_per_matvec": round(per_mv_xla_flops / 1e9, 2),
        "xla_gb_per_matvec": round(per_mv_xla_bytes / 1e9, 3),
        "achieved_tflops_hand": round(achieved_tflops, 2),
        "achieved_tflops_xla": round(achieved_xla_tflops, 2),
        "pct_of_bf16_peak": round(
            100 * achieved_xla_tflops / BF16_PEAK_TFLOPS, 1
        ),
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


if __name__ == "__main__":
    main()
