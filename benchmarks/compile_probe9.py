"""Probe 9 (one VARIANT per process -- the remote compile service caches
subgraphs within a process): which op class is slow inside a loop?
Usage: python compile_probe9.py {fwd|jvp|vjp|ggn|ggn_remat}"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

variant = sys.argv[1]
key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)
v0 = v0 / jnp.linalg.norm(v0)

model = lambda p: resnet18_apply(p, x)

@jax.jit
def run(params, v):
    out0, jvp_f = jax.linearize(model, params)
    _, vjp_f = jax.vjp(model, params)

    mdl = model
    if variant == "ggn_remat":
        mdl = jax.checkpoint(model)
        _, jvp_f = jax.linearize(mdl, params)
        _, vjp_f = jax.vjp(mdl, params)

    def body(_, v):
        vt = ravel.unravel(v)
        if variant == "fwd":
            w = ravel.ravel(jax.grad(
                lambda p: jnp.sum(model(p) * out0))(params)) * v[0] + v
        elif variant == "jvp":
            u = jvp_f(vt)  # tangent convs only
            w = v + jnp.sum(u) * v  # consume, keep flat carry
        elif variant == "vjp":
            w = ravel.ravel(vjp_f(out0 * v[0])[0])  # transposed convs only
        else:  # ggn / ggn_remat
            u = jvp_f(vt)
            w = ravel.ravel(vjp_f(u)[0])
        return w / jnp.linalg.norm(w)

    return jax.lax.fori_loop(0, 10, body, v)

t0 = time.perf_counter()
out = run(params, v0)
_ = float(out[0])
print(f"loop body = {variant}: {time.perf_counter()-t0:.1f}s", flush=True)
