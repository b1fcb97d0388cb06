"""Post-alignment full-step decomposition (one process, interleaved
medians): where does the step's wall-clock go?

Model via argv[1]: "resnet18" (default) or "allcnnc".

Variants (same model/batch/warm state; cg_max_iter=50):
- full: defaults (backtracking + line search + adapt_damping, fused trials)
- no_trials: use_cg_backtracking=False, use_linesearch=False,
  adapt_damping=False, compute_final_loss=False -> gradient + CG solve +
  update only (and no iterate grid: store=(0,))
- store_bf16: full, iterate buffer in bfloat16
- matvec_chain: MV bare matvecs (the amortized-linearize chain), for scale
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

MODEL = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
key = jax.random.PRNGKey(0)
if MODEL == "allcnnc":
    from pytorchhessianfree_tpu.models import (
        allcnnc_apply as apply_fn,
        cross_entropy_loss,
        init_allcnnc,
        l2_regularizer,
    )

    params = init_allcnnc(key, num_classes=100)
    reg = l2_regularizer
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (32, 32, 32, 3), jnp.float32)
    y = jax.random.randint(ky, (32,), 0, 100)
    MV = 30
else:
    from pytorchhessianfree_tpu.models import (
        cross_entropy_loss,
        init_resnet18,
        resnet18_apply as apply_fn,
    )

    params = init_resnet18(key, num_classes=10, in_channels=1)
    reg = None
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (32,), 0, 10)
    MV = 35

ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(model_fn=apply_fn, loss_outer=cross_entropy_loss,
                 loss_reg=reg)
batch = (x, y)

cfg_full = HFConfig(damping=1.0, cg_max_iter=50)
cfg_min = HFConfig(
    damping=1.0,
    cg_max_iter=50,
    use_cg_backtracking=False,
    use_linesearch=False,
    adapt_damping=False,
    compute_final_loss=False,
)
cfg_bf16 = dataclasses.replace(
    cfg_full, cg=dataclasses.replace(cfg_full.cg, store_dtype="bfloat16")
)

steps = {
    "full": make_hf_step(fns, cfg_full, ravel),
    "no_trials": make_hf_step(fns, cfg_min, ravel),
    "store_bf16": make_hf_step(fns, cfg_bf16, ravel),
}


@jax.jit
def matvec_chain(params, v0):
    _, _, _, gv = ggnvp_fn(
        lambda p: apply_fn(p, x), lambda o: cross_entropy_loss(o, y),
        params,
    )

    def body(_, v):
        w = ravel.ravel(gv(ravel.unravel(v)))
        return w / jnp.linalg.norm(w)

    return jax.lax.fori_loop(0, MV, body, v0)


def run(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0])
    return out


# compile/warm everything first
state0 = init_state(ravel, cfg_full)
for name, s in steps.items():
    t0 = time.perf_counter()
    run(name, s, params, state0, batch)
    print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s", flush=True)
v0 = jax.random.normal(jax.random.PRNGKey(7), (ravel.dim,), jnp.float32)
run("mv", matvec_chain, params, v0)

results = {n: [] for n in list(steps) + [f"matvec_chain({MV})"]}
for i in range(3):
    for name, s in steps.items():
        t0 = time.perf_counter()
        _, _, st = run(name, s, params, state0, batch)
        results[name].append((time.perf_counter() - t0, int(st.num_cg_iters)))
    t0 = time.perf_counter()
    run("mv", matvec_chain, params, v0)
    results[f"matvec_chain({MV})"].append((time.perf_counter() - t0, MV))

for name, ts in results.items():
    ts.sort()
    med, it = ts[len(ts) // 2]
    print(f"{name}: {med * 1000:.0f} ms (cg {it})", flush=True)
