"""Probe 5: the slow compile is jvp(model) fed by ravel.unravel(flat).
Does an optimization_barrier between the unravel slices and the tangent
convs fix it?  (In-process A/B; barrier first since it should be fast.)"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import init_resnet18, resnet18_apply

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params)
x = jax.random.normal(key, (32, 28, 28, 1), jnp.float32)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)

def t(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

model = lambda p: resnet18_apply(p, x)

@jax.jit
def jvp_barrier(params, v):
    vt = jax.lax.optimization_barrier(ravel.unravel(v))
    return jax.jvp(model, (params,), (vt,))[1]
t("jvp(unravel + optimization_barrier)", jvp_barrier, params, v0)

@jax.jit
def matvec_barrier(params, v):
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn
    from pytorchhessianfree_tpu.models import cross_entropy_loss
    y = jnp.zeros((32,), jnp.int32)
    _, _, _, mv = ggnvp_fn(model, lambda o: cross_entropy_loss(o, y), params)
    vt = jax.lax.optimization_barrier(ravel.unravel(v))
    return ravel.ravel(mv(vt))
t("full GGN matvec w/ barrier", matvec_barrier, params, v0)

@jax.jit
def jvp_plain(params, v):
    return jax.jvp(model, (params,), (ravel.unravel(v),))[1]
t("jvp(unravel, no barrier) [expect slow]", jvp_plain, params, v0)
