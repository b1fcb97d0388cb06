"""Sustained full-HF-step throughput at the round-3 headline regime:
ResNet-18/MNIST b512 through the scanned on-device train loop (one
dispatch per 20 steps -- the deployment shape of the optimizer).

The single-step sweep measured 138.8 ms/step at b512; the scan removes
per-dispatch relay overhead and lets XLA overlap across steps, so this
is the number a production training loop actually sees.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

B, T = 512, 20
key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
config = HFConfig(damping=1.0, cg_max_iter=50)
loop = make_hf_train_loop(fns, config, ravel)

kx, ky = jax.random.split(key)
xs = jax.random.normal(kx, (T, B, 28, 28, 1), jnp.float32)
ys = jax.random.randint(ky, (T, B), 0, 10)

t0 = time.perf_counter()
p, s, st = loop(params, init_state(ravel, config), (xs, ys))
_ = float(ravel.ravel(p)[0])
print(f"compile+run: {time.perf_counter() - t0:.0f}s", flush=True)

t0 = time.perf_counter()
p, s, st = loop(params, init_state(ravel, config), (xs, ys))
_ = float(ravel.ravel(p)[0])
total = time.perf_counter() - t0
iters = [int(v) for v in st.num_cg_iters]
losses = [float(v) for v in st.init_loss]
print(
    f"sustained: {total:.2f}s for {T} steps x b{B} = "
    f"{total / T * 1e3:.1f} ms/step = {T * B / total:,.0f} samples/s "
    f"of full HF stepping", flush=True,
)
print(f"cg iters/step: {iters}", flush=True)
print(f"loss[0,5,10,19]: " + " ".join(
    f"{losses[i]:.3f}" for i in (0, 5, 10, 19)), flush=True)
