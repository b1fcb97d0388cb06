"""Reproducible steps/wall-clock-to-target-loss harness (BASELINE.md north
star: All-CNN-C/CIFAR-100 to the DeepOBS target).

Data protocol:
- default (no flags): 16 batches x 32 samples of CIFAR-100-shaped inputs
  from PRNGKey(0)-derived streams; labels = argmax of a frozen width-1.0
  All-CNN-C "teacher" initialized from PRNGKey(99).  Fully deterministic
  stand-in while real CIFAR-100 is environment-blocked (zero egress).
- ``--data <dir>``: REAL CIFAR-100 from ``<dir>/train_x.npy`` (float32
  [N,32,32,3] NHWC, DeepOBS-standardized) + ``<dir>/train_y.npy`` (int [N])
  -- the moment data exists, this one command reproduces the DeepOBS-target
  run (reference examples/run_allcnnc_cifar100_deepobs.py:25-40).  Rows are
  taken in a deterministic shuffled order.

Optimizer protocol (both modes):
- model: All-CNN-C (num_classes=100) from PRNGKey(seed), L2-regularized
  cross-entropy (the reference's flagship configuration);
- HFConfig(damping=1.0, cg_max_iter=50) -- reference defaults otherwise;
  STEPS steps as ONE scanned on-device program over the batches in order;
- metric: first step index whose pre-update (init) loss is below each
  target, and wall-clock-to-target = index x sustained ms/step (timed on a
  compile-free invocation).

Robustness: ``--seeds K`` repeats the whole run for model-init seeds
0..K-1 and reports per-seed steps-to-target plus the MEDIAN -- the
steps-to-target metric is a single chaotic f32 trajectory per seed, so the
median over seeds is the stable headline (a dead-code change once shifted
one seed's trajectory through XLA fusion alone; see BENCH_DETAILS).

Flags: --steps N (default 100), --targets a,b,c, --data DIR, --seeds K,
--cg N (cg_max_iter, default 50 -- budget-sensitivity studies),
--ema D (EMA diag-EF preconditioning with decay D, e.g. 0.95; the loop
carries the diagonal on device -- preconditioner payoff studies).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import (
    allcnnc_apply, cross_entropy_loss, init_allcnnc, l2_regularizer,
)


def _flag(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


STEPS = _flag("--steps", 100, int)
TARGETS = tuple(
    float(t) for t in _flag("--targets", "3.0,2.0,1.5,1.0", str).split(",")
)
DATA_DIR = _flag("--data", None, str)
NUM_SEEDS = _flag("--seeds", 1, int)
CG_MAX_ITER = _flag("--cg", 50, int)
EMA_DECAY = _flag("--ema", None, float)
BATCH = 32


def load_batches():
    """(STEPS, 32, 32, 32, 3) inputs + (STEPS, 32) labels."""
    if DATA_DIR is not None:
        x = np.load(os.path.join(DATA_DIR, "train_x.npy"), mmap_mode="r")
        y = np.load(os.path.join(DATA_DIR, "train_y.npy"), mmap_mode="r")
        order = np.random.default_rng(0).permutation(x.shape[0])
        need = STEPS * BATCH
        reps = -(-need // x.shape[0])
        idx = np.concatenate([order] * reps)[:need]
        xs = jnp.asarray(x[idx].reshape(STEPS, BATCH, 32, 32, 3),
                         jnp.float32)
        ys = jnp.asarray(y[idx].reshape(STEPS, BATCH), jnp.int32)
        return xs, ys
    kx, _ = jax.random.split(jax.random.PRNGKey(0))
    xs = jax.random.normal(kx, (16, BATCH, 32, 32, 3), jnp.float32)
    teacher = init_allcnnc(jax.random.PRNGKey(99), num_classes=100)
    ys = jnp.argmax(jax.vmap(lambda xb: allcnnc_apply(teacher, xb))(xs), -1)
    reps = -(-STEPS // 16)
    return (jnp.concatenate([xs] * reps)[:STEPS],
            jnp.concatenate([ys] * reps)[:STEPS])


fns = HFModelFns(
    model_fn=allcnnc_apply, loss_outer=cross_entropy_loss,
    loss_reg=l2_regularizer,
)
config = HFConfig(damping=1.0, cg_max_iter=CG_MAX_ITER)
params0 = init_allcnnc(jax.random.PRNGKey(0), num_classes=100)
ravel = TrainableRavel(params0, pad_to_multiple=1024)
loop = make_hf_train_loop(fns, config, ravel,
                          precond_ema_decay=EMA_DECAY)
batches = load_batches()

print(f"data: {'REAL ' + DATA_DIR if DATA_DIR else 'synthetic teacher'}"
      f" | {STEPS} steps x b{BATCH} | seeds {NUM_SEEDS} | cg "
      f"{CG_MAX_ITER} | ema {EMA_DECAY}", flush=True)

per_seed_losses, ms_per_step = [], None
for seed in range(NUM_SEEDS):
    params = (params0 if seed == 0
              else init_allcnnc(jax.random.PRNGKey(seed), num_classes=100))
    def run_once():
        out = loop(params, init_state(ravel, config), batches)
        _ = float(ravel.ravel(out[0])[0])
        return out[2]
    if ms_per_step is None:
        run_once()  # compile (first seed only; later seeds hit the cache)
        t0 = time.perf_counter()
        stats = run_once()
        total = time.perf_counter() - t0
        ms_per_step = total / STEPS * 1e3
        print(f"sustained: {total:.2f}s for {STEPS} steps = "
              f"{ms_per_step:.1f} ms/step", flush=True)
    else:
        stats = run_once()
    per_seed_losses.append([float(v) for v in stats.init_loss])

for tgt in TARGETS:
    hits = []
    for losses in per_seed_losses:
        hits.append(next((i for i, v in enumerate(losses) if v < tgt), None))
    reached = sorted(h for h in hits if h is not None)
    if not reached:
        best = min(min(l) for l in per_seed_losses)
        print(f"target {tgt}: not reached in {STEPS} steps (best {best:.3f})")
        continue
    med = reached[len(reached) // 2] if len(reached) == len(hits) else None
    per = ", ".join("-" if h is None else str(h) for h in hits)
    if med is not None:
        print(f"target {tgt}: median step {med} -> wall-clock "
              f"{med * ms_per_step / 1e3:.2f}s  (per-seed: {per})")
    else:
        print(f"target {tgt}: reached by {len(reached)}/{len(hits)} seeds "
              f"(per-seed steps: {per})")
for i, losses in enumerate(per_seed_losses):
    idxs = [j for j in (0, 10, 25, 50, STEPS - 1) if j < STEPS]
    print(f"seed {i} loss[{','.join(map(str, idxs))}]:",
          " ".join(f"{losses[j]:.3f}" for j in idxs))
