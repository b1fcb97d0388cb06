"""Whole-epoch training as ONE compiled program (make_hf_train_loop).

Compares per-step wall-clock of Python-looped steps vs the on-device
lax.scan-of-steps loop -- the host-dispatch overhead disappears from the
scanned variant.  No reference analog (its training loops are host-side).
"""

import time

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
    make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply, mse_loss

STEPS = 16

if __name__ == "__main__":
    print(f"Running train-loop demo on {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, sizes=(64, 64, 64, 8))
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=30)
    ravel = TrainableRavel(params)

    xs = jax.random.normal(key, (STEPS, 64, 64), jnp.float32)
    ys = jax.random.normal(key, (STEPS, 64, 8), jnp.float32)

    # Python-looped steps
    step = make_hf_step(fns, config, ravel)
    step(params, init_state(ravel, config), (xs[0], ys[0]))  # compile
    p, s = params, init_state(ravel, config)
    t0 = time.perf_counter()
    for i in range(STEPS):
        p, s, stats = step(p, s, (xs[i], ys[i]))
    jax.block_until_ready(p)
    t_loop = time.perf_counter() - t0
    print(f"python loop : {STEPS} steps in {t_loop:.3f}s "
          f"({1e3 * t_loop / STEPS:.2f} ms/step), "
          f"final loss {float(stats.final_loss):.5f}")

    # One compiled scan over all steps
    loop = make_hf_train_loop(fns, config, ravel)
    p2, s2, st = loop(params, init_state(ravel, config), (xs, ys))  # compile
    jax.block_until_ready(p2)
    t0 = time.perf_counter()
    p2, s2, st = loop(params, init_state(ravel, config), (xs, ys))
    jax.block_until_ready(p2)
    t_scan = time.perf_counter() - t0
    print(f"scan loop   : {STEPS} steps in {t_scan:.3f}s "
          f"({1e3 * t_scan / STEPS:.2f} ms/step), "
          f"final loss {float(st.final_loss[-1]):.5f}")
    print(f"host-dispatch overhead avoided: "
          f"{1e3 * (t_loop - t_scan) / STEPS:.2f} ms/step")

    # The same scan through the stateful wrapper (history per step kept)
    from pytorchhessianfree_tpu import HessianFree

    opt = HessianFree(params, model_fn=mlp_apply, loss_outer=mse_loss,
                      damping=0.5, cg_max_iter=30, pad_to_multiple=None)
    finals = opt.train_steps((xs, ys))
    assert abs(finals[-1] - float(st.final_loss[-1])) < 1e-6
    print(f"wrapper     : opt.train_steps ran {len(finals)} steps, "
          f"final loss {finals[-1]:.5f}, history length "
          f"{len(opt.history['final_losses'])}")
