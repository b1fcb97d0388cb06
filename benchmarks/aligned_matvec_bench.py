"""Post-alignment matvec measurements (one process, interleaved medians).

Refreshes the BENCH_DETAILS matvec rows in the lane-aligned vector space:
f32 vs bf16 curvature, batch scaling, GGN vs HVP.  Protocol matches
bench.py (50-matvec chains, fresh normalized v0 per timed call, host
transfer forces completion).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_resnet18,
    resnet18_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn, hvp_fn

NUM_MATVECS = 50


def _chain(kind, params, ravel, x, y, dtype=None):
    def model_p(p):
        return resnet18_apply(p, x)

    def loss_o(o):
        return cross_entropy_loss(o, y)

    cast = (
        (lambda t: jax.tree_util.tree_map(lambda a: a.astype(dtype), t))
        if dtype is not None
        else (lambda t: t)
    )

    @jax.jit
    def chain(params, v0):
        p = cast(params)
        if kind == "ggn":
            _, _, _, mv = ggnvp_fn(lambda q: resnet18_apply(q, cast(x)),
                                   loss_o, p)
        else:
            _, _, mv = hvp_fn(
                lambda q: cross_entropy_loss(resnet18_apply(q, cast(x)), y),
                p,
            )

        def body(_, v):
            w = ravel.ravel(
                jax.tree_util.tree_map(
                    lambda a: a.astype(ravel.dtype),
                    mv(cast(ravel.unravel(v))),
                )
            )
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    return chain


def measure(kind, batch, dtype=None, label=""):
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (batch,), 0, 10)
    chain = _chain(kind, params, ravel, x, y, dtype)

    def fresh_v(i):
        v = jax.random.normal(
            jax.random.PRNGKey(100 + i), (ravel.dim,), jnp.float32
        )
        return v / jnp.linalg.norm(v)

    float(chain(params, fresh_v(0))[0])
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
        f"{label or kind}: b{batch} dtype={dtype or 'f32'}: "
        f"{rate:.1f} matvec/s ({1000 / rate:.2f} ms/matvec, "
        f"{rate * batch:.0f} sample-matvec/s)",
        flush=True,
    )
    return rate


if __name__ == "__main__":
    measure("ggn", 32)
    measure("ggn", 32, jnp.bfloat16)
    measure("ggn", 256)
    measure("ggn", 256, jnp.bfloat16)
    measure("ggn", 512, jnp.bfloat16)
    measure("hvp", 32)
