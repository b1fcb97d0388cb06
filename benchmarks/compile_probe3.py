"""Bisect the 155s single-matvec compile: jvp vs vjp vs composition, and
reverse-only GGN formulations."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

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
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

model = lambda p: resnet18_apply(p, x)

@jax.jit
def jvp_only(params, v):
    vt = ravel.unravel(v)
    return jax.jvp(model, (params,), (vt,))[1]
t("jvp only", jvp_only, params, v0)

@jax.jit
def vjp_only(params, u):
    out, vjp_fn = jax.vjp(model, params)
    return ravel.ravel(vjp_fn(u)[0])
u0 = jnp.ones((32, 10), jnp.float32)
t("vjp only", vjp_only, params, u0)

@jax.jit
def jvp_then_vjp(params, v):
    vt = ravel.unravel(v)
    Jv = jax.jvp(model, (params,), (vt,))[1]
    out, vjp_fn = jax.vjp(model, params)
    return ravel.ravel(vjp_fn(Jv)[0])
t("jvp + vjp (no linearize)", jvp_then_vjp, params, v0)

@jax.jit
def linearize_call(params, v):
    out, jvp_f = jax.linearize(model, params)
    return jvp_f(ravel.unravel(v))
t("linearize + one call", linearize_call, params, v0)
