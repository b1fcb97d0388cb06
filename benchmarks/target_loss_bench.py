"""Reproducible steps/wall-clock-to-target-loss harness (BASELINE.md north
star; real CIFAR-100 is environment-blocked, so the protocol fixes a seeded
synthetic teacher-labeled dataset).

Protocol (fully deterministic):
- data: 16 batches x 32 samples of CIFAR-100-shaped inputs from
  PRNGKey(0)-derived streams; labels = argmax of a frozen width-1.0
  All-CNN-C "teacher" initialized from PRNGKey(99);
- model: All-CNN-C (num_classes=100) from PRNGKey(0), L2-regularized
  cross-entropy (the reference's flagship configuration);
- optimizer: HFConfig(damping=1.0, cg_max_iter=50) -- reference defaults
  otherwise; 100 steps as ONE scanned on-device program over the batches
  cycling in order;
- metric: first step index whose pre-update (init) loss is below each
  target, and wall-clock-to-target = index x sustained ms/step (timed on
  the second, compile-free invocation).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import (
    allcnnc_apply, cross_entropy_loss, init_allcnnc, l2_regularizer,
)

STEPS = 100
TARGETS = (3.0, 2.0, 1.5, 1.0)

key = jax.random.PRNGKey(0)
params = init_allcnnc(key, num_classes=100)
fns = HFModelFns(
    model_fn=allcnnc_apply, loss_outer=cross_entropy_loss,
    loss_reg=l2_regularizer,
)
config = HFConfig(damping=1.0, cg_max_iter=50)
ravel = TrainableRavel(params, pad_to_multiple=1024)

kx, _ = jax.random.split(key)
xs = jax.random.normal(kx, (16, 32, 32, 32, 3), jnp.float32)
teacher = init_allcnnc(jax.random.PRNGKey(99), num_classes=100)
ys = jnp.argmax(jax.vmap(lambda xb: allcnnc_apply(teacher, xb))(xs), -1)
reps = -(-STEPS // 16)
xs_s = jnp.concatenate([xs] * reps)[:STEPS]
ys_s = jnp.concatenate([ys] * reps)[:STEPS]

loop = make_hf_train_loop(fns, config, ravel)
p, s, stats = loop(params, init_state(ravel, config), (xs_s, ys_s))
_ = float(ravel.ravel(p)[0])  # force (compile run)
t0 = time.perf_counter()
p, s, stats = loop(params, init_state(ravel, config), (xs_s, ys_s))
_ = float(ravel.ravel(p)[0])
total = time.perf_counter() - t0
ms_per_step = total / STEPS * 1e3

losses = [float(v) for v in stats.init_loss]
print(f"sustained: {total:.2f}s for {STEPS} steps = {ms_per_step:.1f} ms/step",
      flush=True)
best = min(losses)
for tgt in TARGETS:
    hit = next((i for i, v in enumerate(losses) if v < tgt), None)
    if hit is None:
        print(f"target {tgt}: not reached in {STEPS} steps (best {best:.3f})")
    else:
        print(f"target {tgt}: step {hit} -> wall-clock "
              f"{hit * ms_per_step / 1e3:.2f}s")
print("loss[0,10,25,50,99]:",
      " ".join(f"{losses[i]:.3f}" for i in (0, 10, 25, 50, 99)))
