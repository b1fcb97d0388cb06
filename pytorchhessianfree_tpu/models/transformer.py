"""A compact Transformer encoder classifier (pure JAX, NHWC-free).

Beyond the reference's model zoo (MLPs and CNNs only): demonstrates that the
Hessian-free pipeline -- GGN through softmax attention and layernorm --
works on attention models unchanged.  Deterministic by construction (no
dropout), so CG's fixed quadratic model assumption holds.

TPU-native layer iteration: the per-layer blocks are identical in shape, so
``transformer_apply`` stacks their weights and runs ONE ``lax.scan`` over the
layer axis (``scan_layers=True``, the default).  The block body is traced
once, not ``n_layers`` times -- and since the HF step differentiates the
model through jvp/vjp/trial phases, the un-scanned form replicates every
per-layer graph across all of those phases too.  Measured on the 19M-param
benchmark transformer (BENCH_DETAILS "scan-over-layers study"): optimized
HLO is 4.4x smaller at 6 layers and 10.2x at 12 (scan stays ~flat with
depth; unrolled grows linearly), at ~10% runtime cost per curvature matvec
at 6 layers; compile WALL-CLOCK through the remote service is dominated by
the service phase (identical programs swing 29 s-40 min), so the program
shrink pays off in depth scaling and memory, not reliably in observed
compile seconds.  ``remat=True`` additionally wraps the scanned block in
``jax.checkpoint`` so backward passes recompute activations per layer
instead of storing all of them.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _dense(key, n_in, n_out, dtype):
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.normal(wk, (n_in, n_out), dtype)
        / jnp.sqrt(jnp.asarray(n_in, dtype)),
        "b": jnp.zeros((n_out,), dtype),
    }


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def _layernorm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _embed(params, tokens, onehot: bool):
    """Token embedding: a row gather, or the gather-free one-hot matmul.

    ``onehot=True`` computes ``one_hot(tokens) @ embed`` -- identical
    values in every dtype (the products are exact 0/1 selections), but
    expressed as a matmul, so its transpose in grad/curvature passes is a
    matmul instead of a scatter-add.  This is the context-parallel knob:
    XLA's SPMD partitioner CHECK-crashes on the curvature program's
    variadic embedding-grad scatter when the token array is sharded along
    BOTH its batch and sequence axes (uneven-tiling pad of a tuple
    constant in ``PadBaseShapeBeforeUnevenTiledSharding``); the one-hot
    form has no scatter to partition.  Single-axis shardings (batch-only
    DP, or sequence-only over the model axis) partition the gather form
    fine -- see parallel/sharded.py ``batch_specs``.
    """
    if onehot:
        oh = jax.nn.one_hot(
            tokens, params["embed"].shape[0], dtype=params["embed"].dtype
        )
        return oh @ params["embed"]
    return params["embed"][tokens]


def init_transformer(
    key,
    vocab: int = 64,
    d_model: int = 32,
    n_heads: int = 4,
    n_layers: int = 2,
    d_ff: int = 64,
    num_classes: int = 4,
    max_len: int = 16,
    dtype=jnp.float32,
) -> Any:
    """Token-classifier encoder: embed + pos -> [attn + MLP blocks] ->
    mean-pool -> linear head."""
    keys = jax.random.split(key, 3 + 5 * n_layers)
    del n_heads  # head count is a static arg of transformer_apply
    params = {
        "embed": jax.random.normal(keys[0], (vocab, d_model), dtype) * 0.1,
        "pos": jax.random.normal(keys[1], (max_len, d_model), dtype) * 0.02,
        "blocks": [],
        "head": _dense(keys[2], d_model, num_classes, dtype),
    }
    ki = 3
    for _ in range(n_layers):
        params["blocks"].append(
            {
                "ln1": _ln_init(d_model, dtype),
                "qkv": _dense(keys[ki], d_model, 3 * d_model, dtype),
                "proj": _dense(keys[ki + 1], d_model, d_model, dtype),
                "ln2": _ln_init(d_model, dtype),
                "ff1": _dense(keys[ki + 2], d_model, d_ff, dtype),
                "ff2": _dense(keys[ki + 3], d_ff, d_model, dtype),
            }
        )
        ki += 5
    return params


def _attend(q, k, v, causal: bool, q_offset: int = 0):
    """Softmax attention for a (chunk of) queries against ALL keys.

    ``q``: [N, H, Tq, dh]; ``k``/``v``: [N, H, Tk, dh] -> [N, H, Tq, dh].
    ``q_offset`` is the global position of q's first row (for the causal
    mask when q is a chunk of a longer sequence).
    """
    d_head = q.shape[-1]
    # accumulate scores in >= f32 (bf16 inputs accumulate f32 on the MXU);
    # f64 stays f64 so the f64 parity oracles are exact
    acc = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=acc
    ).astype(q.dtype) / jnp.sqrt(jnp.asarray(d_head, q.dtype))
    if causal:
        Tq, Tk = scores.shape[-2], scores.shape[-1]
        rows = q_offset + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        scores = jnp.where(
            cols <= rows, scores, jnp.asarray(-1e30, scores.dtype)
        )
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nhqk,nhkd->nhqd", attn, v)


def _chunked_attention(q, k, v, causal: bool, chunk: int):
    """Query-chunked attention: ``lax.scan`` over row blocks of the score
    matrix, each block rematerialized (``jax.checkpoint``).

    Identical numerics to full attention -- softmax rows are independent,
    so row-partitioning changes nothing (pinned by tests at f64) -- but the
    [T, T] probability tensor is never alive at once: peak live memory is
    O(chunk x T) per layer instead of O(T^2), in the forward, the backward
    AND the curvature jvp/vjp passes (the chunk body is re-run per block on
    the way back instead of saving its probabilities).  This is the
    memory-efficient-attention recipe (row-blocked softmax) in pure JAX --
    jvp/vjp-transparent, so GGN/Hessian matvecs flow through it unchanged,
    where a custom attention kernel would break forward-mode autodiff.

    The causal mask is applied per block against global row indices.  The
    scan carries nothing; blocks are the scan's xs/ys, so XLA keeps each
    block's einsums MXU-shaped ([chunk, T] x [T, dh]).
    """
    N, H, T, dh = q.shape
    n_chunks, rem = divmod(T, chunk)
    if rem:
        raise ValueError(
            f"attn_chunk={chunk} must divide the sequence length {T}"
        )
    # [N, H, T, dh] -> [n_chunks, N, H, chunk, dh] (scan axis in front)
    q_blocks = jnp.moveaxis(
        q.reshape(N, H, n_chunks, chunk, dh), 2, 0
    )

    @jax.checkpoint
    def body(_, qc_i):
        qc, i = qc_i
        out = _attend(qc, k, v, causal, q_offset=i * chunk)
        return None, out

    _, out_blocks = jax.lax.scan(
        body, None, (q_blocks, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return jnp.moveaxis(out_blocks, 0, 2).reshape(N, H, T, dh)


def _attention_sublayer(blk, x, n_heads: int, causal: bool, attn_chunk):
    """Pre-LN multi-head attention with residual: [N, T, d] -> [N, T, d].
    Shared by the dense block below and the MoE block (models/moe.py)."""
    N, T, d_model = x.shape
    d_head = d_model // n_heads

    h = _layernorm(blk["ln1"], x)
    qkv = _apply_dense(blk["qkv"], h)  # [N, T, 3*d]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [N, T, d] -> [N, H, T, d_head]
        return t.reshape(N, T, n_heads, d_head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if attn_chunk is not None and attn_chunk < T:
        out = _chunked_attention(q, k, v, causal, attn_chunk)
    else:
        out = _attend(q, k, v, causal)
    out = out.transpose(0, 2, 1, 3).reshape(N, T, d_model)
    return x + _apply_dense(blk["proj"], out)


def _block(
    blk, x, n_heads: int, causal: bool = False, attn_chunk=None
):
    """One pre-LN attention + MLP residual block: [N, T, d] -> [N, T, d]."""
    x = _attention_sublayer(blk, x, n_heads, causal, attn_chunk)
    h = _layernorm(blk["ln2"], x)
    h = jax.nn.gelu(_apply_dense(blk["ff1"], h))
    return x + _apply_dense(blk["ff2"], h)


def stack_blocks(blocks):
    """List of per-layer block pytrees -> one pytree with a leading layer
    axis (the ``lax.scan`` carry-free xs layout)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def _run_blocks(
    blocks, x, n_heads, scan_layers, remat, causal=False, attn_chunk=None
):
    if not blocks:
        return x
    if not scan_layers:
        for blk in blocks:
            if remat:
                x = jax.checkpoint(
                    lambda b, t: _block(b, t, n_heads, causal, attn_chunk)
                )(blk, x)
            else:
                x = _block(blk, x, n_heads, causal, attn_chunk)
        return x

    def body(carry, blk):
        return _block(blk, carry, n_heads, causal, attn_chunk), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stack_blocks(blocks))
    return x


def transformer_apply(
    params: Any,
    tokens: jax.Array,
    n_heads: int = 4,
    scan_layers: bool = True,
    remat: bool = False,
    attn_chunk: int | None = None,
    embed_onehot: bool = False,
) -> jax.Array:
    """Forward pass.  ``tokens``: [N, T] int32 -> [N, num_classes] logits.

    ``scan_layers=True`` (default) stacks the per-layer weights and runs the
    blocks as one ``lax.scan`` -- the block graph is traced/compiled once
    instead of per layer (and per autodiff phase of the enclosing HF step).
    Numerics match the unrolled loop to f64 ulp level (a pinned test asserts
    ~1e-12 agreement of forward/grad/GGN-matvec; exact bits differ only
    through XLA fusion choices).  ``remat=True`` wraps the block in
    ``jax.checkpoint`` (per-layer activation rematerialization).
    ``attn_chunk`` row-blocks the attention softmax (``_chunked_attention``)
    so peak live memory per layer is O(chunk x T) instead of O(T^2) --
    identical numerics, composes with ``remat`` and ``scan_layers``.
    ``embed_onehot`` switches the token embedding to the gather-free
    one-hot matmul (see ``_embed`` -- the 2-D-sharded-tokens knob).
    """
    T = tokens.shape[1]
    x = _embed(params, tokens, embed_onehot) + params["pos"][:T]
    x = _run_blocks(
        params["blocks"], x, n_heads, scan_layers, remat,
        attn_chunk=attn_chunk,
    )
    pooled = jnp.mean(x, axis=1)
    return _apply_dense(params["head"], pooled)


def init_decoder_lm(
    key,
    vocab: int = 64,
    d_model: int = 32,
    n_heads: int = 4,
    n_layers: int = 2,
    d_ff: int = 64,
    max_len: int = 16,
    dtype=jnp.float32,
    tied_head: bool = True,
) -> Any:
    """Causal decoder LM: embed + pos -> [causal attn + MLP blocks] ->
    final LN -> per-position vocab logits.

    The loss spans the sequence axis (next-token prediction at every
    position), unlike the encoder classifier's pooled single label -- this is
    the workload where the sequence dimension does real second-order work.
    ``tied_head=True`` reuses the embedding matrix as the output projection
    (weight tying), halving the embedding parameter count.
    """
    enc = init_transformer(
        key,
        vocab=vocab,
        d_model=d_model,
        n_heads=n_heads,
        n_layers=n_layers,
        d_ff=d_ff,
        num_classes=vocab,
        max_len=max_len,
        dtype=dtype,
    )
    params = {
        "embed": enc["embed"],
        "pos": enc["pos"],
        "blocks": enc["blocks"],
        "ln_f": _ln_init(d_model, dtype),
    }
    if not tied_head:
        params["head"] = enc["head"]
    return params


def decoder_lm_apply(
    params: Any,
    tokens: jax.Array,
    n_heads: int = 4,
    scan_layers: bool = True,
    remat: bool = False,
    attn_chunk: int | None = None,
    embed_onehot: bool = False,
) -> jax.Array:
    """Causal forward pass.  ``tokens``: [N, T] int32 -> [N, T, vocab]
    logits, position t predicting token t+1 (strictly causal attention).

    ``attn_chunk`` row-blocks the attention softmax (the causal mask is
    applied per block against global positions): the [T, T] probability
    tensor is never materialized in the forward, backward or curvature
    passes.  Measured on the chip (BENCH_DETAILS sequence-scaling
    section): at T>=1024 this is FASTER than full attention (the
    probability tensors' HBM round-trip dominates), it trains the
    long-sequence configs that compile-OOM without per-layer ``remat``,
    and it beats the remat rescue at those lengths -- the default lever
    for the sequence axis.  ``embed_onehot``
    switches the token embedding to the gather-free one-hot matmul (see
    ``_embed`` -- the 2-D-sharded-tokens knob)."""
    T = tokens.shape[1]
    x = _embed(params, tokens, embed_onehot) + params["pos"][:T]
    x = _run_blocks(
        params["blocks"], x, n_heads, scan_layers, remat, causal=True,
        attn_chunk=attn_chunk,
    )
    x = _layernorm(params["ln_f"], x)
    if "head" in params:
        return _apply_dense(params["head"], x)
    return x @ params["embed"].T


def next_token_loss(
    logits: jax.Array,
    tokens: jax.Array,
    onehot: bool = False,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean next-token cross-entropy: ``logits`` [N, T, V] at position t
    scored against ``tokens[:, t+1]``, averaged over all N*(T-1) positions.

    Mean reduction keeps the GGN scale batch-size invariant, matching the
    reference's mean-loss convention (reference optimizer.py:221-227 uses the
    closure's own reduction; all examples use mean).

    ``onehot=True`` selects the target log-probs by a one-hot contraction
    instead of ``take_along_axis`` -- identical values, no gather, so the
    loss partitions under 2-D-sharded tokens (same rationale and caveat as
    ``_embed``; pair with ``embed_onehot=True``).

    ``mask``: optional [N, T] 0/1 weights over TARGET positions (mask[:, t]
    weights the prediction of token t; position 0 is never a target) --
    padded-sequence training.  The mean is over the masked positions
    (``sum(ll * m) / sum(m)``), so the loss scale stays length-invariant.
    For HF, thread the mask through the batch pytree alongside the tokens
    so every phase of the step sees it."""
    pred = logits[:, :-1, :]
    tgt = tokens[:, 1:]
    logp = jax.nn.log_softmax(pred, axis=-1)
    if onehot:
        oh = jax.nn.one_hot(tgt, logits.shape[-1], dtype=logp.dtype)
        ll = jnp.sum(logp * oh, axis=-1)
    else:
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if mask is None:
        return -jnp.mean(ll)
    m = mask[:, 1:].astype(ll.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)
