"""Which component makes ResNet-18's jvp compile 25x slower than its vjp?
Times jvp-compile of: plain conv stacks (large + tiny spatial), BN-only
stack, ResNet with BN replaced by identity, and full ResNet."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu.models.resnet import (
    _conv_init, batchnorm, conv, init_resnet18, max_pool, resnet18_apply,
    _STAGES, _block_apply,
)

key = jax.random.PRNGKey(0)

def t(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

def time_jvp(name, apply, params, x):
    @jax.jit
    def j(params, x, v):
        return jax.jvp(lambda p: apply(p, x), (params,), (v,))[1]
    v = jax.tree_util.tree_map(jnp.ones_like, params)
    t(name, j, params, x, v)

# 1. plain 3x3 conv stack, healthy spatial (32x32, 96ch) -- allcnnc-like
ks = jax.random.split(key, 8)
params1 = [_conv_init(k, 3, 3, 96, 96, jnp.float32) for k in ks]
def stack1(p, x):
    for w in p:
        x = jax.nn.relu(conv(x, w, 1))
    return jnp.mean(x)
x1 = jax.random.normal(key, (32, 32, 32, 96), jnp.float32)
time_jvp("jvp: 8x conv3x3 96ch 32x32", stack1, params1, x1)

# 2. plain conv stack at ResNet's TINY tail spatial dims (2x2, 512ch)
params2 = [_conv_init(k, 3, 3, 512, 512, jnp.float32) for k in ks]
x2 = jax.random.normal(key, (32, 2, 2, 512), jnp.float32)
time_jvp("jvp: 8x conv3x3 512ch 2x2", stack1, params2, x2)

# 3. BN-only stack (no convs)
def stack3(p, x):
    for sb in p:
        x = jax.nn.relu(batchnorm(x, sb["scale"], sb["bias"]))
    return jnp.mean(x)
params3 = [
    {"scale": jnp.ones((96,)), "bias": jnp.zeros((96,))} for _ in range(16)
]
time_jvp("jvp: 16x batchnorm 96ch", stack3, params3, x1)

# 4. ResNet-18 with BN disabled (identity)
import pytorchhessianfree_tpu.models.resnet as R
params4 = init_resnet18(key, num_classes=10, in_channels=1)
orig_bn = R.batchnorm
try:
    R.batchnorm = lambda x, s, b: x * s + b  # elementwise only
    x4 = jax.random.normal(key, (32, 28, 28, 1), jnp.float32)
    time_jvp("jvp: resnet18, BN->affine", R.resnet18_apply, params4, x4)
finally:
    R.batchnorm = orig_bn

# 5. full ResNet-18 (baseline for this process)
time_jvp("jvp: resnet18 full", resnet18_apply, params4, x4)
