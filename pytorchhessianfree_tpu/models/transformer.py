"""A compact Transformer encoder classifier (pure JAX, NHWC-free).

Beyond the reference's model zoo (MLPs and CNNs only): demonstrates that the
Hessian-free pipeline -- GGN through softmax attention and layernorm --
works on attention models unchanged.  Deterministic by construction (no
dropout), so CG's fixed quadratic model assumption holds.
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


def transformer_apply(
    params: Any, tokens: jax.Array, n_heads: int = 4
) -> jax.Array:
    """Forward pass.  ``tokens``: [N, T] int32 -> [N, num_classes] logits."""
    N, T = tokens.shape
    x = params["embed"][tokens] + params["pos"][:T]
    d_model = x.shape[-1]
    d_head = d_model // n_heads

    for blk in params["blocks"]:
        h = _layernorm(blk["ln1"], x)
        qkv = _apply_dense(blk["qkv"], h)  # [N, T, 3*d]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [N, T, d] -> [N, H, T, d_head]
            return t.reshape(N, T, n_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
        ).astype(x.dtype) / jnp.sqrt(jnp.asarray(d_head, x.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(N, T, d_model)
        x = x + _apply_dense(blk["proj"], out)

        h = _layernorm(blk["ln2"], x)
        h = jax.nn.gelu(_apply_dense(blk["ff1"], h))
        x = x + _apply_dense(blk["ff2"], h)

    pooled = jnp.mean(x, axis=1)
    return _apply_dense(params["head"], pooled)
