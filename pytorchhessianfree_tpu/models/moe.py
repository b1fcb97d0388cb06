"""Mixture-of-Experts causal decoder LM (GShard-style einsum dispatch).

The sparse-expert member of the model zoo -- no reference analog (the
reference's models are MLPs and CNNs, reference examples/; this closes the
"modern architecture" axis the same way the transformer family did).  The
Hessian-free pipeline needs nothing special: routing is deterministic given
(params, batch), the top-k masks are piecewise-constant (zero tangent), and
the GGN's jvp/vjp flow through the gate probabilities and the expert MLPs
-- CG's fixed-quadratic assumption holds exactly as for dense models.

TPU-native formulation: routing is expressed as EINSUMS against 0/1
dispatch/combine tensors (the Mesh-TensorFlow/GShard recipe), not gathers
-- MXU-shaped, jvp/vjp-transparent, and GSPMD-partitionable.  Expert
parallelism is just a ``param_specs`` entry sharding the expert axis of
``w1``/``w2`` over the mesh (``moe_param_specs``); XLA inserts the
dispatch collectives.  The dispatch tensors are ``[S, Gg, E, C]`` with
``C ~ 2Gg/E`` -- ``O(G^2 / S)`` elements for ``router_groups=S`` (GShard's
per-group capacity; groups bound the router's memory, and at production
scale the group axis is the data axis so GSPMD turns the dispatch into
all-to-alls).

Top-2 (GShard) or top-1 (Switch, ``top_k=1``) routing with per-expert
capacity (tokens over capacity fall back to the residual stream),
normalized top-2 / raw top-1 gates, optional Switch-style load-balance
auxiliary loss.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from .transformer import (
    _attention_sublayer,
    _dense,
    _embed,
    _layernorm,
    _ln_init,
    stack_blocks,
)


def init_moe_decoder_lm(
    key,
    vocab: int = 64,
    d_model: int = 32,
    n_heads: int = 4,
    n_layers: int = 2,
    d_ff: int = 64,
    n_experts: int = 4,
    max_len: int = 16,
    dtype=jnp.float32,
) -> Any:
    """Causal decoder LM whose per-block FFN is a top-2 MoE layer.

    Block params: attention as in ``models/transformer.py`` plus
    ``gate`` [d_model, E] and batched expert MLPs ``w1`` [E, d_model, d_ff],
    ``b1`` [E, d_ff], ``w2`` [E, d_ff, d_model], ``b2`` [E, d_model].
    The head is tied to the embedding (``x @ embed.T``).
    """
    keys = jax.random.split(key, 3 + 6 * n_layers)
    params = {
        "embed": jax.random.normal(keys[0], (vocab, d_model), dtype) * 0.1,
        "pos": jax.random.normal(keys[1], (max_len, d_model), dtype) * 0.02,
        "blocks": [],
        "ln_f": _ln_init(d_model, dtype),
    }
    ki = 2
    for _ in range(n_layers):
        kg, k1, k2 = keys[ki + 2], keys[ki + 3], keys[ki + 4]
        params["blocks"].append(
            {
                "ln1": _ln_init(d_model, dtype),
                "qkv": _dense(keys[ki], d_model, 3 * d_model, dtype),
                "proj": _dense(keys[ki + 1], d_model, d_model, dtype),
                "ln2": _ln_init(d_model, dtype),
                "gate": jax.random.normal(kg, (d_model, n_experts), dtype)
                / jnp.sqrt(jnp.asarray(d_model, dtype)),
                "w1": jax.random.normal(
                    k1, (n_experts, d_model, d_ff), dtype
                ) / jnp.sqrt(jnp.asarray(d_model, dtype)),
                "b1": jnp.zeros((n_experts, d_ff), dtype),
                "w2": jax.random.normal(
                    k2, (n_experts, d_ff, d_model), dtype
                ) / jnp.sqrt(jnp.asarray(d_ff, dtype)),
                "b2": jnp.zeros((n_experts, d_model), dtype),
            }
        )
        ki += 6
    return params


def _topk_dispatch(probs, capacity: int, top_k: int = 2):
    """GShard/Switch dispatch/combine tensors from router probabilities.

    ``probs``: [G, E] softmax outputs -> ``(dispatch [G, E, C] 0/1,
    combine [G, E, C], aux scalar)``.  ``top_k=2`` is GShard top-2:
    first-choice tokens claim expert slots before second-choice tokens
    (cumsum position counters), gates are the two chosen probabilities
    renormalized to sum to one.  ``top_k=1`` is Switch routing: single
    expert, gate = its raw router probability (no renormalization, as in
    the Switch Transformer).  A token whose choice is over capacity loses
    that choice (all over -> the MoE output is zero and the residual
    stream carries it).  The masks and slot positions are
    piecewise-constant in ``probs`` (zero tangent); gradients and GGN
    tangents flow through the gate values in ``combine``.  ``aux`` is the
    Switch load-balance loss ``E * sum_e f_e * P_e`` (f_e = first-choice
    routing fraction, P_e = mean router probability).
    """
    G, E = probs.shape
    idx1 = jnp.argmax(probs, axis=-1)
    mask1 = jax.nn.one_hot(idx1, E, dtype=probs.dtype)

    # slot position of every token within its chosen expert, first-choice
    # tokens first (cumsum over the token axis = arrival order)
    pos1 = jnp.cumsum(mask1, axis=0) - mask1
    keep1 = mask1 * (pos1 < capacity)
    p1 = jnp.sum(pos1 * keep1, axis=-1).astype(jnp.int32)
    oh1 = jax.nn.one_hot(p1, capacity, dtype=probs.dtype)  # [G, C]
    g1 = jnp.sum(probs * mask1, axis=-1)

    f = jnp.mean(mask1, axis=0)
    P = jnp.mean(probs, axis=0)
    aux = jnp.asarray(E, probs.dtype) * jnp.sum(f * P)

    if top_k == 1:
        dispatch = keep1[:, :, None] * oh1[:, None, :]
        combine = (keep1 * g1[:, None])[:, :, None] * oh1[:, None, :]
        return dispatch, combine, aux

    probs_wo1 = probs * (1.0 - mask1)
    idx2 = jnp.argmax(probs_wo1, axis=-1)
    mask2 = jax.nn.one_hot(idx2, E, dtype=probs.dtype)
    count1 = jnp.sum(mask1, axis=0, keepdims=True)
    pos2 = jnp.cumsum(mask2, axis=0) - mask2 + count1
    keep2 = mask2 * (pos2 < capacity)
    p2 = jnp.sum(pos2 * keep2, axis=-1).astype(jnp.int32)
    oh2 = jax.nn.one_hot(p2, capacity, dtype=probs.dtype)
    g2 = jnp.sum(probs * mask2, axis=-1)

    denom = g1 + g2
    denom = jnp.where(denom > 0, denom, jnp.ones_like(denom))
    g1n, g2n = g1 / denom, g2 / denom

    dispatch = (
        keep1[:, :, None] * oh1[:, None, :]
        + keep2[:, :, None] * oh2[:, None, :]
    )
    combine = (
        (keep1 * g1n[:, None])[:, :, None] * oh1[:, None, :]
        + (keep2 * g2n[:, None])[:, :, None] * oh2[:, None, :]
    )
    return dispatch, combine, aux


def _moe_ffn(blk, h, capacity_factor: float, router_groups: int = 1,
             top_k: int = 2):
    """Top-2 MoE feed-forward over [N, T, d] activations -> (out, aux)."""
    N, T, d = h.shape
    E = blk["gate"].shape[-1]
    if top_k not in (1, 2):
        raise ValueError(f"top_k must be 1 or 2, got {top_k}")
    if E < 2:
        raise ValueError(
            f"routing needs >= 2 experts, got {E} (with one expert the "
            "second argmax would silently re-select it; use a dense FFN)"
        )
    G = N * T
    if G % router_groups != 0:
        raise ValueError(
            f"router_groups={router_groups} must divide the token count "
            f"{G} (= batch {N} x seq {T})"
        )
    Gg = G // router_groups
    capacity = int(math.ceil(capacity_factor * top_k * Gg / E))
    # [S groups, Gg, d]: tokens compete for expert slots WITHIN their
    # group only (GShard's per-group capacity -- groups=1 is the global
    # single-program form).  The dispatch/combine tensors are
    # [S, Gg, E, C] = O(G^2 / S) elements total, so groups scale the
    # router's memory linearly down; at production scale the group axis
    # is the data axis and GSPMD turns the dispatch into all-to-alls.
    hg = h.reshape(router_groups, Gg, d)

    logits = jnp.einsum("sgd,de->sge", hg, blk["gate"])
    probs = jax.nn.softmax(logits, axis=-1)
    dispatch, combine, aux = jax.vmap(
        lambda p: _topk_dispatch(p, capacity, top_k)
    )(probs)
    aux = jnp.mean(aux)

    xe = jnp.einsum("sgec,sgd->secd", dispatch, hg)
    h1 = jax.nn.gelu(
        jnp.einsum("secd,edf->secf", xe, blk["w1"])
        + blk["b1"][None, :, None, :]
    )
    ye = jnp.einsum("secf,efd->secd", h1, blk["w2"]) + (
        blk["b2"][None, :, None, :]
    )
    out = jnp.einsum("sgec,secd->sgd", combine, ye)
    return out.reshape(N, T, d), aux


def _moe_block(
    blk, x, n_heads: int, capacity_factor: float, attn_chunk=None,
    router_groups: int = 1,
    top_k: int = 2,
):
    """Causal pre-LN attention + MoE-FFN residual block -> (x, aux)."""
    x = _attention_sublayer(blk, x, n_heads, True, attn_chunk)
    h = _layernorm(blk["ln2"], x)
    moe_out, aux = _moe_ffn(blk, h, capacity_factor, router_groups,
                            top_k)
    return x + moe_out, aux


def moe_decoder_lm_apply(
    params,
    tokens: jax.Array,
    n_heads: int = 4,
    capacity_factor: float = 1.25,
    router_groups: int = 1,
    top_k: int = 2,
    scan_layers: bool = True,
    remat: bool = False,
    attn_chunk: int | None = None,
    embed_onehot: bool = False,
    return_aux: bool = False,
):
    """Causal forward pass.  ``tokens``: [N, T] int32 -> [N, T, vocab]
    logits (tied embedding head); ``return_aux=True`` additionally returns
    the mean Switch load-balance loss over the layers (fold it into the
    training loss via ``loss_outer`` if desired -- the GGN treats it as
    one more output block).  ``router_groups=S`` routes with per-group
    capacity over S equal slices of the flattened tokens (O(G^2/S)
    dispatch memory; per-group-oracle-tested).  ``top_k=1`` switches to
    Switch-style single-expert routing (gate = the raw router
    probability, capacity cf*G/E).

    Knobs compose exactly as on ``decoder_lm_apply``: ``scan_layers``
    (blocks as ONE ``lax.scan`` over stacked weights), ``remat``,
    ``attn_chunk`` (row-blocked attention softmax), ``embed_onehot``
    (gather-free embedding for 2-D-sharded tokens).
    """
    T = tokens.shape[1]
    x = _embed(params, tokens, embed_onehot) + params["pos"][:T]
    blocks = params["blocks"]

    if not scan_layers:
        aux_total = jnp.zeros((), x.dtype)
        for blk in blocks:
            if remat:
                x, aux = jax.checkpoint(
                    lambda b, t: _moe_block(
                        b, t, n_heads, capacity_factor, attn_chunk,
                        router_groups, top_k,
                    )
                )(blk, x)
            else:
                x, aux = _moe_block(
                    blk, x, n_heads, capacity_factor, attn_chunk,
                    router_groups, top_k,
                )
            aux_total = aux_total + aux
        aux_mean = aux_total / len(blocks)
    else:
        stacked = stack_blocks(blocks)

        def body(carry, blk):
            out, aux = _moe_block(
                blk, carry, n_heads, capacity_factor, attn_chunk,
                router_groups, top_k,
            )
            return out, aux

        if remat:
            body = jax.checkpoint(body)
        x, auxs = jax.lax.scan(body, x, stacked)
        aux_mean = jnp.mean(auxs)

    x = _layernorm(params["ln_f"], x)
    logits = x @ params["embed"].T
    if return_aux:
        return logits, aux_mean
    return logits


def moe_param_specs(n_layers: int):
    """Expert-parallel ``param_specs`` for ``make_sharded_hf_step``: the
    expert axis of every expert tensor shards over the ``model`` mesh axis;
    attention, layernorms, gate and embeddings stay replicated (shard them
    further with Megatron-style specs if desired).  The dispatch einsums
    then partition over E and XLA inserts the token-exchange collectives
    -- expert parallelism as a sharding annotation, not a new runtime.
    """
    from jax.sharding import PartitionSpec as P

    ep = {
        "ln1": P(), "ln2": P(), "qkv": P(), "proj": P(), "gate": P(),
        "w1": P("model", None, None),
        "b1": P("model", None),
        "w2": P("model", None, None),
        "b2": P("model", None),
    }
    return {
        "embed": P(),
        "pos": P(),
        "ln_f": P(),
        "blocks": [dict(ep) for _ in range(n_layers)],
    }
