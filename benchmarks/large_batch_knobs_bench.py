"""In-process A/B of the reduced-precision knobs at the large-batch
regime the round-3 sweep selected (ResNet-18, b512, cg_max_iter=50).

The b32 decomposition showed the step dominated by weight traffic; at
b512 the matvec carries 16x the activation traffic, so the knobs that
halve buffer bytes (cg.store_dtype for the iterate grid, curvature_dtype
for the matvec weights/activations) may matter more than they did at
b32.  Variants share the model/state/batch and are interleaved in one
process (remote-service phases make cross-process timing invalid).
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

B = 512
key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (B, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (B,), 0, 10)

base = HFConfig(damping=1.0, cg_max_iter=50)
variants = {
    "f32": base,
    "store_bf16": dataclasses.replace(
        base, cg=dataclasses.replace(base.cg, store_dtype="bfloat16")
    ),
    "curv_bf16": dataclasses.replace(base, curvature_dtype="bfloat16"),
    "both_bf16": dataclasses.replace(
        base,
        curvature_dtype="bfloat16",
        cg=dataclasses.replace(base.cg, store_dtype="bfloat16"),
    ),
}
steps = {}
for name, cfg in variants.items():
    steps[name] = (make_hf_step(fns, cfg, ravel), cfg)

state0 = init_state(ravel, base)
for name, (s, cfg) in steps.items():
    t0 = time.perf_counter()
    p, st, stats = s(params, state0, (x, y))
    _ = float(stats.final_loss)
    print(f"{name}: compile+run {time.perf_counter() - t0:.0f}s "
          f"(cg {int(stats.num_cg_iters)}, final "
          f"{float(stats.final_loss):.4f})", flush=True)

results = {n: [] for n in steps}
for rep in range(3):
    for name, (s, cfg) in steps.items():
        t0 = time.perf_counter()
        p, st, stats = s(params, state0, (x, y))
        _ = float(stats.final_loss)
        results[name].append(
            (time.perf_counter() - t0, int(stats.num_cg_iters))
        )
for name, rs in results.items():
    ts = sorted(t for t, _ in rs)
    iters = [i for _, i in rs]
    print(f"{name}: {ts[1] * 1e3:.1f} ms/step (cg iters {iters})",
          flush=True)
