"""Probe 6: is a matvec LOOP with a pytree carry (no flat-vector
ravel/unravel inside the loop) cheap to compile?  Decides whether CG
should move to pytree space."""
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

def t(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

def tree_vdot(a, b):
    return sum(
        jnp.vdot(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )

@jax.jit
def loop_tree(params, x, y, v0):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    vt0 = ravel.unravel(v0)
    def body(_, v):
        w = mv(v)
        nrm = jnp.sqrt(tree_vdot(w, w))
        return jax.tree_util.tree_map(lambda a: a / nrm, w)
    out = jax.lax.fori_loop(0, 10, body, vt0)
    return ravel.ravel(out)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)
t("10-trip loop, PYTREE carry", loop_tree, params, x, y, v0)

@jax.jit
def loop_tree_scan(params, x, y, v0):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    vt0 = ravel.unravel(v0)
    def body(v, _):
        w = mv(v)
        nrm = jnp.sqrt(tree_vdot(w, w))
        return jax.tree_util.tree_map(lambda a: a / nrm, w), nrm
    out, nrms = jax.lax.scan(body, vt0, None, length=10)
    return nrms
t("10-trip scan, PYTREE carry", loop_tree_scan, params, x, y, v0)
