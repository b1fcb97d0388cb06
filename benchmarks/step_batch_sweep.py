"""Full-HF-step throughput vs batch size (the step-level large-batch
campaign, VERDICT r2 next-round #3).

Round 2 established matvec-level scaling to b512 but only ever timed the
FULL step at b32 (the weight-traffic-bound regime).  This sweep measures
the complete step (gradient -> damped Martens-PCG -> LM damping ->
backtracking -> line search -> update, cg_max_iter=50) at b32..b512 and
reports ms/step, CG iters, and step-level samples/s, plus an acc_step
(stacked-scan) point at the largest effective batch.

One model family per invocation (each (model, batch) pair is its own XLA
program; splitting keeps a run under the remote-compile budget):

    python benchmarks/step_batch_sweep.py resnet
    python benchmarks/step_batch_sweep.py allcnnc
    python benchmarks/step_batch_sweep.py resnet --acc   # + acc_step point
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_acc_step,
    make_hf_step,
)

MODEL = "allcnnc" if "allcnnc" in sys.argv else "resnet"
BATCHES = [32, 128, 256, 512]
WITH_ACC = "--acc" in sys.argv

key = jax.random.PRNGKey(0)
if MODEL == "resnet":
    from pytorchhessianfree_tpu.models import (
        cross_entropy_loss, init_resnet18, resnet18_apply as apply_fn,
    )

    params = init_resnet18(key, num_classes=10, in_channels=1)
    shape, ncls, reg = (28, 28, 1), 10, None
else:
    from pytorchhessianfree_tpu.models import (
        allcnnc_apply as apply_fn, cross_entropy_loss, init_allcnnc,
        l2_regularizer,
    )

    params = init_allcnnc(key, num_classes=100)
    shape, ncls, reg = (32, 32, 3), 100, l2_regularizer

ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(model_fn=apply_fn, loss_outer=cross_entropy_loss,
                 loss_reg=reg)
config = HFConfig(damping=1.0, cg_max_iter=50)
step = make_hf_step(fns, config, ravel)
print(f"model={MODEL} params={ravel.unpadded_dim:,} cg_max_iter=50",
      flush=True)


def batch_for(b, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (b,) + shape, jnp.float32)
    y = jax.random.randint(ky, (b,), 0, ncls)
    return x, y


def time_step(run, batch):
    state = init_state(ravel, config)
    t0 = time.perf_counter()
    p, s, st = run(params, state, batch)
    _ = float(st.final_loss)
    compile_s = time.perf_counter() - t0
    times, iters = [], []
    p, s = params, state
    for i in range(3):
        t0 = time.perf_counter()
        p, s, st = run(p, s, batch)
        _ = float(st.final_loss)
        times.append(time.perf_counter() - t0)
        iters.append(int(st.num_cg_iters))
    times.sort()
    med = times[len(times) // 2]
    return med, iters, compile_s


for b in BATCHES:
    batch = batch_for(b)
    try:
        med, iters, compile_s = time_step(step, batch)
    except Exception as e:  # OOM etc: report and continue
        print(f"b{b}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        continue
    print(
        f"b{b}: {med * 1e3:.1f} ms/step ({b / med:,.0f} samples/s), "
        f"cg iters {iters}, compile {compile_s:.0f}s",
        flush=True,
    )

if WITH_ACC:
    # acc_step: 4 stacked chunks of 128 = effective b512 (the reference's
    # large-batch mechanism, scanned on device)
    acc = make_hf_acc_step(fns, config, ravel, "mean", mvp_amortize=False)
    chunks = [batch_for(128, seed=i) for i in range(4)]

    def run_acc(p, s, data):
        return acc(p, s, data)

    try:
        med, iters, compile_s = time_step(run_acc, chunks)
        print(
            f"acc_step 4x128 (eff b512): {med * 1e3:.1f} ms/step "
            f"({512 / med:,.0f} samples/s), cg iters {iters}, "
            f"compile {compile_s:.0f}s",
            flush=True,
        )
    except Exception as e:
        print(f"acc_step: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
