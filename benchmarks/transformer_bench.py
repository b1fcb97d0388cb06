"""Attention-model GGN matvec throughput on the real chip.

A larger transformer encoder (d_model 512, 6 layers, seq 128 -- ~19M
params, beyond ResNet-18's 11.2M) exercises the curvature path through
softmax attention / layernorm at production-ish shapes: the matvec is
einsum/matmul-dominated (MXU) rather than conv-dominated.  Protocol
matches bench.py (50-matvec chains, fresh normalized v0 per call, host
transfer forces completion, medians of 3).
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
D_MODEL, LAYERS, D_FF, HEADS = 512, 6, 2048, 8
VOCAB, T, CLASSES = 1024, 128, 64


def main(batch=32):
    key = jax.random.PRNGKey(0)
    params = init_transformer(
        key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS,
        d_ff=D_FF, num_classes=CLASSES, max_len=T,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    tokens = jax.random.randint(kx, (batch, T), 0, VOCAB)
    labels = jax.random.randint(ky, (batch,), 0, CLASSES)

    @jax.jit
    def chain(params, v0):
        _, _, _, gv = ggnvp_fn(
            lambda p: transformer_apply(p, tokens, n_heads=HEADS),
            lambda o: cross_entropy_loss(o, labels),
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
    print(
        f"transformer {n_params / 1e6:.1f}M params, b{batch} seq{T}: "
        f"compile+warm {time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    times = []
    for i in range(1, 4):
        v0 = fresh_v(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = chain(params, v0)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    rate = NUM_MATVECS / times[len(times) // 2]
    print(
        f"GGN matvecs: {rate:.1f}/s ({1000 / rate:.2f} ms each, "
        f"{rate * batch:.0f} sample-matvec/s)",
        flush=True,
    )


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 32)
