"""Select-mode A/B at current defaults (cond store, fused trials), IN ONE
PROCESS: sequential fused evaluator vs batched backtracking + batched
(chunked) line search.  ResNet-18/MNIST b32, cg_max_iter=50, interleaved
medians of 5."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    LineSearchConfig,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_resnet18,
    resnet18_apply,
)

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)
batch = (x, y)

variants = {
    "sequential_fused": HFConfig(damping=1.0, cg_max_iter=50),
    "batched": HFConfig(
        damping=1.0, cg_max_iter=50, backtracking_mode="batched",
        linesearch=LineSearchConfig(mode="batched"),
    ),
    "batched_chunk5": HFConfig(
        damping=1.0, cg_max_iter=50, backtracking_mode="batched",
        linesearch=LineSearchConfig(mode="batched", batch_chunk=5),
    ),
}
steps = {n: make_hf_step(fns, cfg, ravel) for n, cfg in variants.items()}

state0 = init_state(ravel, variants["sequential_fused"])
for n, s in steps.items():
    t0 = time.perf_counter()
    _, _, st = s(params, state0, batch)
    _ = float(st.final_loss)
    print(f"{n}: compile+run {time.perf_counter() - t0:.1f}s "
          f"(cg {int(st.num_cg_iters)})", flush=True)

results = {n: [] for n in steps}
for i in range(5):
    for n, s in steps.items():
        t0 = time.perf_counter()
        p, _, st = s(params, state0, batch)
        _ = float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
        results[n].append(time.perf_counter() - t0)
for n, ts in results.items():
    ts.sort()
    print(f"{n}: {ts[len(ts) // 2] * 1000:.0f} ms median "
          f"(min {ts[0] * 1000:.0f})", flush=True)
