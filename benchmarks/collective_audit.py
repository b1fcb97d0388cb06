"""Collective-volume audit of the multi-chip HF step programs.

No hardware needed: the DP and 2-D (data x model) step programs are compiled
for a virtual 8-device CPU mesh, and the optimized HLO is parsed for the
collectives XLA actually inserted (all-reduce / all-gather / reduce-scatter /
collective-permute), grouped by enclosing computation and flagged when that
computation is a loop body (CG while_loop, trial walks).  Payload bytes come
from the op output shapes.

This turns SURVEY's "psum over ICI" promise into numbers: per-CG-iteration
collective bytes, per-step fixed bytes, and (in docs/DESIGN.md, which quotes
this script's output) a falsifiable ICI-time prediction for real multi-chip
runs.

Usage: python benchmarks/collective_audit.py [n_devices]
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
)
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
from pytorchhessianfree_tpu.models.mlp import mse_loss
from pytorchhessianfree_tpu.optimizer import hf_step
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.sharded import _prepare

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
    "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
)


def _shape_bytes(shape_str):
    """Total bytes of an HLO shape string ('f32[100,2]' or a tuple of
    them)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def audit_hlo(hlo_text):
    """Parse optimized HLO: collectives per computation + loop-body flags.

    Returns ``(per_comp, loop_bodies)`` where per_comp maps computation name
    -> list of (op_kind, payload_bytes, full_line) and loop_bodies is the
    set of computation names used as while-loop bodies.
    """
    per_comp = collections.defaultdict(list)
    loop_bodies = set()
    comp = None
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # computation definitions start at column 0 and open a brace:
        #   %region_0.31 (arg: (f32[...], ...)) -> (...) {
        #   ENTRY %main.123 (...) -> (...) {
        if line and not line[0].isspace() and stripped.endswith("{"):
            m = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)", stripped)
            if m:
                comp = m.group(1)
            continue
        bm = re.search(r"body=%?([\w\.\-]+)", stripped)
        if bm and "while(" in stripped:
            loop_bodies.add(bm.group(1))
        for kind in _COLLECTIVES:
            # op lines look like: %x = SHAPE all-reduce(...) where SHAPE may
            # be a tuple "(f32[512], /*index=5*/ f32[1024], ...)" whose
            # comments contain '='; locate the op token and take everything
            # between the assignment and it as the shape string.
            idx = -1
            for token in (f" {kind}(", f" {kind}-start("):
                idx = stripped.find(token)
                if idx != -1:
                    break
            if idx == -1:
                continue
            eq = stripped.find("= ")
            if eq == -1 or eq > idx:
                continue
            shape_str = stripped[eq + 2:idx]
            per_comp[comp].append(
                (kind, _shape_bytes(shape_str), stripped[:160])
            )
            break
    return per_comp, loop_bodies


def summarize(name, hlo_text, verbose=False):
    per_comp, loop_bodies = audit_hlo(hlo_text)
    groups = {}
    for comp, ops in per_comp.items():
        key = f"LOOP:{comp}" if comp in loop_bodies else "once-per-step"
        g = groups.setdefault(
            key, collections.defaultdict(lambda: [0, 0])
        )
        for kind, nbytes, line in ops:
            g[kind][0] += 1
            g[kind][1] += nbytes
            if verbose:
                print(f"    [{key}] {line}")
    result = {
        "program": name,
        "collectives": {
            key: {
                kind: {"count": n, "payload_bytes": b}
                for kind, (n, b) in sorted(g.items())
            }
            for key, g in sorted(groups.items())
        },
    }
    return result


def build_programs(n_devices=8):
    """Lower + compile the DP and 2-D sharded HF step for a virtual mesh.

    Mirrors make_dp_hf_step / make_sharded_hf_step's jit setup
    (parallel/data_parallel.py:38-85, parallel/sharded.py:176-244) -- the
    builders hide their jits in closures, so the audit reconstructs the
    same sharding annotations explicitly.
    """
    key = jax.random.PRNGKey(0)
    # a wider MLP so collective payloads are at realistic scale (~1.1M
    # params -> 4.4 MB grad-sized all-reduces)
    params = init_mlp(key, sizes=(256, 512, 1024, 512, 10))
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=1.0, cg_max_iter=50)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    x = jax.random.normal(key, (64, 256), jnp.float32)
    y = jax.random.normal(key, (64, 10), jnp.float32)
    state = init_state(ravel, config)

    out = {}

    # --- pure DP: batch sharded over 8, params/state replicated ---------
    mesh = make_mesh(n_devices, axis_names=("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    step = jax.jit(
        functools.partial(hf_step, fns=fns, config=config, ravel=ravel),
        out_shardings=repl,
    )
    args = (
        jax.device_put(params, repl),
        jax.device_put(state, repl),
        (jax.device_put(x, shard), jax.device_put(y, shard)),
    )
    out[f"dp_{n_devices}"] = (
        step.lower(*args).compile().as_text(),
        ravel.dim,
    )

    # --- 2-D: data=2 x model=4, CG vectors sharded over model -----------
    mesh2 = make_mesh(n_devices, axis_names=("data", "model"))
    (
        config2, use_data, repl2, vec_s, buf_s, shard_vec, shard_buf,
        state_s,
    ) = _prepare(config, ravel, mesh2, "data", "model")
    batch_s = NamedSharding(mesh2, P("data"))
    step2 = jax.jit(
        functools.partial(
            hf_step, fns=fns, config=config2, ravel=ravel,
            shard_vec=shard_vec, shard_buf=shard_buf,
        ),
        out_shardings=(repl2, state_s, repl2),
    )
    args2 = (
        jax.device_put(params, repl2),
        jax.device_put(state, state_s),
        (jax.device_put(x, batch_s), jax.device_put(y, batch_s)),
    )
    out["2d_data2_model4"] = (
        step2.lower(*args2).compile().as_text(),
        ravel.dim,
    )

    # --- context parallel: decoder-LM tokens sharded along T over model --
    # (batch_specs=P(None, "model") layout; attention is the only op that
    # mixes positions, so any all-gather beyond the DP/2-D baseline is the
    # per-layer k/v gather)
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    dparams = init_decoder_lm(
        key, vocab=256, d_model=128, n_heads=4, n_layers=2, d_ff=256,
        max_len=128,
    )
    dfns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
    )
    dravel = TrainableRavel(dparams, pad_to_multiple=1024)
    dconfig = HFConfig(damping=1.0, cg_max_iter=50)
    (
        dconfig, _, drepl, dvec_s, _, dshard_vec, dshard_buf, dstate_s,
    ) = _prepare(dconfig, dravel, mesh2, "data", "model")
    tokens = jax.random.randint(key, (8, 128), 0, 256)
    tok_s = NamedSharding(mesh2, P(None, "model"))
    dstep = jax.jit(
        functools.partial(
            hf_step, fns=dfns, config=dconfig, ravel=dravel,
            shard_vec=dshard_vec, shard_buf=dshard_buf,
        ),
        out_shardings=(drepl, dstate_s, drepl),
    )
    dargs = (
        jax.device_put(dparams, drepl),
        jax.device_put(init_state(dravel, dconfig), dstate_s),
        (jax.device_put(tokens, tok_s), jax.device_put(tokens, tok_s)),
    )
    out["cp_decoder_seq_over_model4"] = (
        dstep.lower(*dargs).compile().as_text(),
        dravel.dim,
    )

    # --- 2-D context parallel: tokens sharded over BOTH axes (batch over
    # data, sequence over model) via the gather-free one-hot forms (the
    # plain embedding gather CHECK-crashes XLA's SPMD partitioner in this
    # layout -- docs/API.md caveat); quantifies the workaround's
    # collective cost relative to the 1-D CP row above
    d2fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(
            p, t, n_heads=4, embed_onehot=True
        ),
        loss_outer=lambda o, t: next_token_loss(o, t, onehot=True),
    )
    d2config = HFConfig(damping=1.0, cg_max_iter=50)
    (
        d2config, _, d2repl, _, _, d2shard_vec, d2shard_buf, d2state_s,
    ) = _prepare(d2config, dravel, mesh2, "data", "model")
    tok2_s = NamedSharding(mesh2, P("data", "model"))
    d2step = jax.jit(
        functools.partial(
            hf_step, fns=d2fns, config=d2config, ravel=dravel,
            shard_vec=d2shard_vec, shard_buf=d2shard_buf,
        ),
        out_shardings=(d2repl, d2state_s, d2repl),
    )
    d2args = (
        jax.device_put(dparams, d2repl),
        jax.device_put(init_state(dravel, d2config), d2state_s),
        (jax.device_put(tokens, tok2_s), jax.device_put(tokens, tok2_s)),
    )
    out["cp2d_onehot_data2_model4"] = (
        d2step.lower(*d2args).compile().as_text(),
        dravel.dim,
    )

    # --- expert parallel: MoE decoder, expert axis over model=4 ---------
    # (moe_param_specs layout; the dispatch einsums against the 0/1
    # dispatch/combine tensors are what GSPMD partitions over E)
    from pytorchhessianfree_tpu.models import (
        init_moe_decoder_lm,
        moe_decoder_lm_apply,
        moe_param_specs,
    )

    n_layers = 2
    mparams = init_moe_decoder_lm(
        key, vocab=256, d_model=128, n_heads=4, n_layers=n_layers,
        d_ff=256, n_experts=4, max_len=64,
    )
    mfns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
    )
    mravel = TrainableRavel(mparams, pad_to_multiple=1024)
    mconfig = HFConfig(damping=1.0, cg_max_iter=50)
    (
        mconfig, _, mrepl, mvec_s, _, mshard_vec, mshard_buf, mstate_s,
    ) = _prepare(mconfig, mravel, mesh2, "data", "model")
    mspecs = moe_param_specs(n_layers)
    mparams_s = jax.tree_util.tree_map(
        lambda spec, sub: jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh2, spec), sub
        ),
        mspecs, mparams,
        is_leaf=lambda s: isinstance(s, type(P())),
    )
    mtoks = jax.random.randint(key, (8, 64), 0, 256)
    mtok_s = NamedSharding(mesh2, P("data"))
    mstep = jax.jit(
        functools.partial(
            hf_step, fns=mfns, config=mconfig, ravel=mravel,
            shard_vec=mshard_vec, shard_buf=mshard_buf,
        ),
        out_shardings=(mparams_s, mstate_s, mrepl),
    )
    margs = (
        jax.tree_util.tree_map(jax.device_put, mparams, mparams_s),
        jax.device_put(init_state(mravel, mconfig), mstate_s),
        (jax.device_put(mtoks, mtok_s), jax.device_put(mtoks, mtok_s)),
    )
    out["ep_moe_experts_over_model4"] = (
        mstep.lower(*margs).compile().as_text(),
        mravel.dim,
    )
    return out, mesh2


def while_loops_with_permutes(hlo_text):
    """For each while loop whose BODY contains a collective-permute, return
    ``{body, trip_count, permutes: [(bytes, line)]}``.

    The trip count is read from the loop's CONDITION computation (a scan
    lowers to ``while(cond: i < K)``; K is the compare's constant operand) --
    this is what lets the GPipe bubble model be checked against the HLO
    itself: the tick loop must run exactly ``M + S - 1`` times to deliver
    ``M`` microbatches, making ``(S-1)/(M+S-1)`` of every pass idle.
    """
    # computation name -> its text lines
    comps = collections.defaultdict(list)
    comp = None
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if line and not line[0].isspace() and stripped.endswith("{"):
            m = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)", stripped)
            if m:
                comp = m.group(1)
            continue
        if comp:
            comps[comp].append(stripped)

    # while ops: condition= / body= pairs
    pairs = []
    for lines in comps.values():
        for s in lines:
            if "while(" in s:
                bm = re.search(r"body=%?([\w\.\-]+)", s)
                cm = re.search(r"condition=%?([\w\.\-]+)", s)
                if bm and cm:
                    pairs.append((cm.group(1), bm.group(1)))

    out = []
    for cond, body in pairs:
        permutes = []
        for s in comps.get(body, ()):
            for token in (" collective-permute(", " collective-permute-start("):
                idx = s.find(token)
                if idx != -1:
                    eq = s.find("= ")
                    if eq != -1 and eq < idx:
                        permutes.append((_shape_bytes(s[eq + 2:idx]), s[:160]))
                    break
        if not permutes:
            continue
        # trip count: the largest integer constant in the condition
        # computation (the induction compare's bound; scans count 0..K-1)
        consts = [
            int(v)
            for s in comps.get(cond, ())
            for v in re.findall(r"constant\((\d+)\)", s)
        ]
        out.append({
            "body": body,
            "trip_count": max(consts) if consts else None,
            "permutes": permutes,
        })
    return out


def build_pp_program(n_stages, n_microbatches, batch=8, seq=16, d_model=64,
                     d_ff=128, n_layers=4, vocab=64):
    """Compile the FULL HF step through a GPipe-pipelined decoder on a
    virtual ``stage`` mesh.  Returns ``(hlo_text, meta)`` where meta carries
    the analytic predictions to check:

    - ``mb_bytes``: one microbatch's activation payload ``[N/M, T, d]`` f32
      (what every ppermute tick moves per device),
    - ``ticks``: ``M + S - 1`` (the GPipe fill/drain schedule length),
    - ``bubble_frac``: ``(S - 1) / (M + S - 1)``.
    """
    from pytorchhessianfree_tpu.models import (
        init_decoder_lm,
        next_token_loss,
    )
    from pytorchhessianfree_tpu.models.transformer import (
        _block,
        _layernorm,
        stack_blocks,
    )
    from pytorchhessianfree_tpu.optimizer import make_hf_step
    from pytorchhessianfree_tpu.parallel.pipeline import pipeline_blocks

    key = jax.random.PRNGKey(7)
    params = init_decoder_lm(
        key, vocab=vocab, d_model=d_model, n_layers=n_layers, d_ff=d_ff,
        max_len=seq,
    )
    pmesh = make_mesh(n_stages, axis_names=("stage",))

    def pp_model(p, tokens):
        x = p["embed"][tokens] + p["pos"][: tokens.shape[1]]
        x = pipeline_blocks(
            stack_blocks(p["blocks"]), x,
            lambda blk, h: _block(blk, h, 4, causal=True),
            pmesh, n_microbatches=n_microbatches,
        )
        x = _layernorm(p["ln_f"], x)
        return x @ p["embed"].T

    fns = HFModelFns(model_fn=pp_model, loss_outer=next_token_loss)
    config = HFConfig(damping=1.0, cg_max_iter=50)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    toks = jax.random.randint(key, (batch, seq), 0, vocab)
    step = make_hf_step(fns, config, ravel)
    hlo = (
        jax.jit(step)
        .lower(params, init_state(ravel, config), (toks, toks))
        .compile()
        .as_text()
    )
    S, M = n_stages, n_microbatches
    meta = {
        "S": S,
        "M": M,
        "mb_bytes": (batch // M) * seq * d_model * 4,
        "ticks": M + S - 1,
        "bubble_frac": round((S - 1) / (M + S - 1), 4),
        "flat_dim": ravel.dim,
    }
    return hlo, meta


def pp_audit(n_stages, n_microbatches, **kw):
    """The PP collective row: ppermute count/volume + the HLO-level check
    of the GPipe tick count behind the documented bubble model."""
    hlo, meta = build_pp_program(n_stages, n_microbatches, **kw)
    loops = while_loops_with_permutes(hlo)
    # the tick loops: trip_count == M+S-1 and a microbatch-sized payload.
    # (every model pass in the step program -- gradient, CG matvec body,
    # trial forwards -- contains one; the CG loop nests it.)
    tick_loops = [
        lp for lp in loops
        if lp["trip_count"] == meta["ticks"]
        and any(b == meta["mb_bytes"] for b, _ in lp["permutes"])
    ]
    result = {
        "program": f"pp_S{n_stages}_M{n_microbatches}",
        **meta,
        "per_pass_permute_bytes": meta["ticks"] * meta["mb_bytes"],
        "tick_loops_found": len(tick_loops),
        "permute_loops_total": len(loops),
        "model_checks": {
            "trip_count==M+S-1": bool(tick_loops),
            "payload==microbatch": bool(tick_loops),
        },
    }
    return result


def main(n_devices=8, verbose=False, pp=True):
    programs, mesh2 = build_programs(n_devices)
    results = []
    for name, (hlo, dim) in programs.items():
        print(f"== {name} (flat dim {dim}) ==")
        r = summarize(name, hlo, verbose=verbose)
        results.append(r)
        print(json.dumps(r, indent=1))
    if pp:
        for S, M in ((2, 4), (4, 4), (4, 8)):
            print(f"== pp_S{S}_M{M} ==")
            r = pp_audit(S, M)
            results.append(r)
            print(json.dumps(r, indent=1))
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(n, verbose="-v" in sys.argv)
