"""ResNet-18 on (synthetic) MNIST with the full HF pipeline: PCG +
empirical-Fisher preconditioner + CG-backtracking + Armijo line search
(the analog of reference examples/run_resnet18_mnist.py; synthetic data
because this environment has no dataset egress -- see example_utils)."""

import time

import jax
from example_utils import force_cpu_if_requested, report, synthetic_mnist_batch

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_resnet18,
    resnet18_apply,
)

if __name__ == "__main__":
    print(f"Running ResNet-18/MNIST on {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    print(f"parameters: {n_params:,}")

    opt = HessianFree(
        params,
        model_fn=resnet18_apply,
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=50,  # keep the demo quick; default is 250
    )

    for step_idx in range(2):
        key, kb = jax.random.split(key)
        batch = synthetic_mnist_batch(kb, batch_size=32)
        if step_idx == 0:
            det = opt.test_deterministic(batch)
            print("determinism self-test:", det)
        t0 = time.perf_counter()
        opt.step(batch)
        dt = time.perf_counter() - t0
        report(step_idx, opt)
        print(f"         wall-clock {dt:.2f}s"
              f"{' (incl. compile)' if step_idx == 0 else ''}")
