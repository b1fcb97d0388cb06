"""Probe 8: order-swapped rerun of probe 7 (fresh process) to rule out
remote-compile caching; plus a scan(length=)-with-storage variant to
isolate xs=arange vs length=None."""
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
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

def make_mv(params):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    return mv

@jax.jit
def scan_storage(params, x, y, v):
    mv = make_mv(params)
    n = v.shape[0]
    buf = jnp.zeros((18 * n,), jnp.float32)
    def work(args):
        v, buf, i = args
        w = ravel.ravel(mv(ravel.unravel(v)))
        w = w / jnp.linalg.norm(w)
        buf = jax.lax.dynamic_update_slice(buf, w, ((i % 18) * n,))
        return w, buf
    def body(carry, i):
        v, buf, done = carry
        v, buf = jax.lax.cond(done, lambda a: (a[0], a[1]), work, (v, buf, i))
        done = done | (v[0] > 1e30)
        return (v, buf, done), None
    (v, buf, _), _ = jax.lax.scan(
        body, (v, buf, jnp.asarray(False)), jnp.arange(50))
    return v + buf[:n]
t("A: scan(xs=arange) + cond + storage [FIRST]", scan_storage, params, x, y, v0)

@jax.jit
def scan_plain(params, x, y, v):
    mv = make_mv(params)
    def work(v):
        w = ravel.ravel(mv(ravel.unravel(v)))
        return w / jnp.linalg.norm(w)
    def body(carry, _):
        v, done = carry
        v = jax.lax.cond(done, lambda u: u, work, v)
        done = done | (v[0] > 1e30)
        return (v, done), None
    (v, _), _ = jax.lax.scan(body, (v, jnp.asarray(False)), None, length=50)
    return v
t("B: scan(length=None-xs) + cond [SECOND]", scan_plain, params, x, y, v0)
