"""HVP vs GGN matvec throughput (ResNet-18/MNIST, full-pipeline hot op).

VERDICT r1 item #4: the Hessian path used to re-run forward-over-reverse
per CG iteration; hvp_fn now linearizes value_and_grad once per batch (the
analog of the reference's retained graph, reference optimizer.py:231-233,
:450-455).  This measures both curvature paths with the same chained-matvec
harness as bench.py.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn, hvp_fn

BATCH = int(os.environ.get("HVP_BENCH_BATCH", "32"))
NUM = 50

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (BATCH, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (BATCH,), 0, 10)


def make_chain(kind):
    @jax.jit
    def chain(params, x, y, v0):
        if kind == "ggn":
            _, _, _, mv = ggnvp_fn(
                lambda p: resnet18_apply(p, x),
                lambda o: cross_entropy_loss(o, y),
                params,
            )
        else:
            _, _, mv = hvp_fn(
                lambda p: cross_entropy_loss(resnet18_apply(p, x), y), params
            )

        def body(_, v):
            w = ravel.ravel(mv(ravel.unravel(v)))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM, body, v0)

    return chain


def fresh_v(i):
    v = jax.random.normal(jax.random.PRNGKey(100 + i), (ravel.dim,),
                          jnp.float32)
    return v / jnp.linalg.norm(v)


for kind in ("ggn", "hvp"):
    chain = make_chain(kind)
    t0 = time.perf_counter()
    float(chain(params, x, y, fresh_v(0))[0])  # compile + warmup
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(1, 4):
        v0 = fresh_v(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = chain(params, x, y, v0)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    rate = NUM / times[1]
    print(f"{kind}: {rate:.1f} matvec/s (b{BATCH}, median of 3; "
          f"compile {compile_s:.0f}s)", flush=True)
