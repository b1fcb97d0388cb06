"""Isolate the 168s matvec-loop compile: single matvec vs loop, linearize-
replay vs fresh-rederive body, and loop-free unrolled pair."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)

def t(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

@jax.jit
def single(params, x, y, v):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    return ravel.ravel(mv(ravel.unravel(v)))
t("single matvec (linearize, no loop)", single, params, x, y, v0)

@jax.jit
def pair(params, x, y, v):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    w = ravel.ravel(mv(ravel.unravel(v)))
    w = w / jnp.linalg.norm(w)
    return ravel.ravel(mv(ravel.unravel(w)))
t("two matvecs unrolled (no loop)", pair, params, x, y, v0)

@jax.jit
def loop_replay(params, x, y, v):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    def body(_, v):
        w = ravel.ravel(mv(ravel.unravel(v)))
        return w / jnp.linalg.norm(w)
    return jax.lax.fori_loop(0, 3, body, v)
t("3-trip loop (linearize replay body)", loop_replay, params, x, y, v0)

@jax.jit
def loop_fresh(params, x, y, v):
    def body(_, v):
        _, _, _, mv = ggnvp_fn(
            lambda p: resnet18_apply(p, x),
            lambda o: cross_entropy_loss(o, y), params)
        w = ravel.ravel(mv(ravel.unravel(v)))
        return w / jnp.linalg.norm(w)
    return jax.lax.fori_loop(0, 3, body, v)
t("3-trip loop (fresh jvp/vjp body)", loop_fresh, params, x, y, v0)
