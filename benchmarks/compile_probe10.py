"""Probe 10 (one variant per process): is BatchNorm's tangent the in-loop
compile pathology?  Usage: python compile_probe10.py {noBN|BNonly|BN2|full}"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import TrainableRavel
import pytorchhessianfree_tpu.models.resnet as R

variant = sys.argv[1]
key = jax.random.PRNGKey(0)

if variant == "noBN":
    R.batchnorm = lambda x, s, b: x * s + b  # affine only
elif variant == "BN2":
    # variance via E[x^2] - E[x]^2 instead of E[(x-mu)^2]
    def bn2(x, scale, bias):
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        ex2 = jnp.mean(x * x, axis=(0, 1, 2), keepdims=True)
        var = ex2 - mean * mean
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv * scale + bias
    R.batchnorm = bn2

params = R.init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params)
x = jax.random.normal(key, (32, 28, 28, 1), jnp.float32)
v0 = jax.random.normal(key, (ravel.dim,), jnp.float32)
v0 = v0 / jnp.linalg.norm(v0)

if variant == "BNonly":
    # deep BN-only net, no convs, params = 16 x (scale, bias) on 64ch
    params = [
        {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
        for _ in range(16)
    ]
    ravel = TrainableRavel(params)
    x = jax.random.normal(key, (32, 14, 14, 64), jnp.float32)
    v0 = jnp.ones((ravel.dim,), jnp.float32)

    def apply(p, x):
        for sb in p:
            x = jax.nn.relu(R.batchnorm(x, sb["scale"], sb["bias"]))
        return jnp.mean(x, axis=(1, 2))
else:
    apply = R.resnet18_apply

model = lambda p: apply(p, x)

@jax.jit
def run(params, v):
    _, jvp_f = jax.linearize(model, params)

    def body(_, v):
        u = jvp_f(ravel.unravel(v))
        return v + jnp.sum(u) * 1e-9 * v

    return jax.lax.fori_loop(0, 10, body, v)

t0 = time.perf_counter()
out = run(params, v0)
_ = float(out[0])
print(f"loop jvp, {variant}: {time.perf_counter()-t0:.1f}s", flush=True)
