"""Chunk-size tuning for the accumulation path at fixed effective batch.

The round-3 sweep found All-CNN-C's scanned acc_step (4x128) FASTER than
the monolithic b512 step -- chunking shrinks the activation working set
through the CG loop.  This sweep holds the effective batch at 512 and
varies the chunk shape to find the optimum (one process, medians of 3).

    python benchmarks/acc_chunk_sweep.py [resnet]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_acc_step,
)

MODEL = "resnet" if "resnet" in sys.argv else "allcnnc"
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
acc = make_hf_acc_step(fns, config, ravel, "mean")
EFF = 512
print(f"model={MODEL} effective batch {EFF}, cg_max_iter=50", flush=True)

kx, ky = jax.random.split(key)
x_all = jax.random.normal(kx, (EFF,) + shape, jnp.float32)
y_all = jax.random.randint(ky, (EFF,), 0, ncls)

for n_chunks in (2, 4, 8, 16):
    per = EFF // n_chunks
    xs = x_all.reshape(n_chunks, per, *shape)
    ys = y_all.reshape(n_chunks, per)
    state = init_state(ravel, config)
    try:
        t0 = time.perf_counter()
        p, s, st = acc(params, state, (xs, ys))
        _ = float(st.final_loss)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, s, st = acc(p, s, (xs, ys))
            _ = float(st.final_loss)
            times.append(time.perf_counter() - t0)
        times.sort()
        print(
            f"{n_chunks}x{per}: {times[1] * 1e3:.1f} ms/step "
            f"({EFF / times[1]:,.0f} samples/s), cg "
            f"{int(st.num_cg_iters)}, compile {compile_s:.0f}s",
            flush=True,
        )
    except Exception as e:
        print(f"{n_chunks}x{per}: FAILED ({type(e).__name__}: "
              f"{str(e)[:100]})", flush=True)
