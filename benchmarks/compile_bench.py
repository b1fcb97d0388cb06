"""Compile-time A/B: fused_trials vs standalone trial loops (ResNet-18 b32,
cg_max_iter=50, full pipeline).  Run on the real TPU (remote compile)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import dataclasses

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)

key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)

results = {}
outs = {}
for fused in ([True, False] if "--fused-only" not in sys.argv else [True]):
    config = HFConfig(damping=1.0, cg_max_iter=50, fused_trials=fused)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    t0 = time.perf_counter()
    p, s, st = step(params, state, (x, y))
    _ = float(ravel.ravel(p)[0])  # force completion through the relay
    compile_s = time.perf_counter() - t0
    # steady-state step time (3 runs, median)
    times = []
    for i in range(3):
        st2 = init_state(ravel, config)
        t0 = time.perf_counter()
        p2, s2, stt = step(params, st2, (x, y))
        _ = float(ravel.ravel(p2)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    results[fused] = (compile_s, times[1], int(stt.num_cg_iters))
    outs[fused] = (jax.device_get(ravel.ravel(p)), jax.device_get(st.lr),
                   jax.device_get(st.final_loss))
    print(f"fused={fused}: compile {compile_s:.1f}s, step {times[1]*1e3:.0f}ms, "
          f"cg {int(stt.num_cg_iters)}", flush=True)

if len(outs) == 2:
    import numpy as np
    dp = np.abs(outs[True][0] - outs[False][0]).max()
    print(f"numerics: max param diff fused-vs-standalone = {dp:.3e}, "
          f"lr {float(outs[True][1])} vs {float(outs[False][1])}, "
          f"final {float(outs[True][2]):.6f} vs {float(outs[False][2]):.6f}")
