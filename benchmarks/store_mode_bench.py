"""store_mode A/B: scratch-row vs cond-skip iterate store, IN ONE PROCESS.

Both full-step variants (ResNet-18/MNIST b32, cg_max_iter=50) are compiled
in the same process and timed interleaved -- the only valid comparison on
the remote-compile path, whose queue latency swings 29-475 s between
processes (BENCH_DETAILS "compile noise").  Results are identical by
construction (the scratch row is never read; cond skips the same dead
write); this measures run time only.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
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

base = HFConfig(damping=1.0, cg_max_iter=50)
steps = {}
for mode in ("scratch", "cond"):
    cfg = dataclasses.replace(
        base, cg=dataclasses.replace(base.cg, store_mode=mode)
    )
    steps[mode] = make_hf_step(fns, cfg, ravel)

state0 = init_state(ravel, base)
outs = {}
for mode, s in steps.items():
    t0 = time.perf_counter()
    p, _, st = s(params, state0, batch)
    _ = float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
    print(f"{mode}: compile+run {time.perf_counter() - t0:.1f}s "
          f"(cg {int(st.num_cg_iters)})", flush=True)
    outs[mode] = p

# identical results
for a, b in zip(
    jax.tree_util.tree_leaves(outs["scratch"]),
    jax.tree_util.tree_leaves(outs["cond"]),
):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("results bit-identical", flush=True)

results = {m: [] for m in steps}
for i in range(5):
    for mode, s in steps.items():
        t0 = time.perf_counter()
        p, _, st = s(params, state0, batch)
        _ = float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
        results[mode].append(time.perf_counter() - t0)
for mode, ts in results.items():
    ts.sort()
    print(f"{mode}: {ts[len(ts) // 2] * 1000:.0f} ms median "
          f"(min {ts[0] * 1000:.0f})", flush=True)
