"""A/B: default step vs padded vector space vs padded + fused Pallas CG
update (ResNet-18/MNIST b32, cg_max_iter=50).  In-process, interleaved."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
)
from pytorchhessianfree_tpu.config import CGConfig
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)

variants = {
    "default": (TrainableRavel(params), CGConfig()),
    "padded": (TrainableRavel(params, pad_to_multiple=1024), CGConfig()),
    "padded+kernel": (
        TrainableRavel(params, pad_to_multiple=1024),
        CGConfig(use_fused_kernel=True),
    ),
}

steps = {}
for name, (ravel, cgc) in variants.items():
    config = HFConfig(damping=1.0, cg_max_iter=50, cg=cgc)
    step = make_hf_step(fns, config, ravel)
    t0 = time.perf_counter()
    p, s, st = step(params, init_state(ravel, config), (x, y))
    _ = float(ravel.ravel(p)[0])
    print(f"{name}: compile {time.perf_counter()-t0:.1f}s "
          f"(cg {int(st.num_cg_iters)}, final {float(st.final_loss):.6f})",
          flush=True)
    steps[name] = (step, ravel, config)

# interleaved steady-state timing, 4 rounds
times = {k: [] for k in variants}
for r in range(4):
    for name, (step, ravel, config) in steps.items():
        s0 = init_state(ravel, config)
        t0 = time.perf_counter()
        p, s, st = step(params, s0, (x, y))
        _ = float(ravel.ravel(p)[0])
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    ts.sort()
    print(f"{name}: step {ts[len(ts)//2]*1e3:.0f} ms (median of 4)",
          flush=True)
