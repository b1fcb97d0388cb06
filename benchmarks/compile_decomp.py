"""Where does the ResNet-18 step's compile time go?  Times jit-compile of
each program layer separately (same process, same remote-compile service):
forward, value_and_grad, GGN matvec chain, CG solve, full step."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn
from pytorchhessianfree_tpu.ops.cg import cg

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)

def t(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

t("forward", jax.jit(lambda p, x: resnet18_apply(p, x)), params, x)
t("value_and_grad", jax.jit(
    jax.value_and_grad(lambda p: cross_entropy_loss(resnet18_apply(p, x), y))
), params)

@jax.jit
def ggn_chain(params, x, y, v0):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    def body(_, v):
        w = ravel.ravel(mv(ravel.unravel(v)))
        return w / jnp.linalg.norm(w)
    return jax.lax.fori_loop(0, 10, body, v0)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)
t("ggn matvec fori_loop", ggn_chain, params, x, y, v0)

@jax.jit
def cg_solve(params, x, y, b):
    _, _, _, mv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y), params)
    def A(v):
        return ravel.ravel(mv(ravel.unravel(v))) + 1.0 * v
    res = cg(A, b, max_iter=50, martens_conv_crit=True, store_x_at_iters=None)
    return res.x
t("cg solve (grid storage)", cg_solve, params, x, y, v0)

config = HFConfig(damping=1.0, cg_max_iter=50, fused_trials=True)
step = make_hf_step(fns, config, ravel)
t("full step (fused)", step, params, init_state(ravel, config), (x, y))
