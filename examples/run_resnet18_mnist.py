"""ResNet-18 on MNIST with the full HF pipeline: PCG + empirical-Fisher
preconditioner + CG-backtracking + Armijo line search
(the analog of reference examples/run_resnet18_mnist.py).

Data: synthetic MNIST-shaped batches by default (no dataset egress in the
build environment); pass ``--data <dir>`` with ``train_x.npy`` (float32
[N,28,28,1], [0,1]-scaled) + ``train_y.npy`` (int [N]) to stream the real
dataset through the native loader + device prefetcher -- the real-MNIST
analog of the reference's torchvision pipeline
(reference examples/run_resnet18_mnist.py:12-27)."""

import time

import jax
from example_utils import (
    force_cpu_if_requested,
    parse_data_dir,
    real_batch_stream,
    report,
    synthetic_mnist_batch,
)

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_resnet18,
    resnet18_apply,
)

if __name__ == "__main__":
    import sys

    # --tiny: width-scaled model + small batch/CG budget so the example
    # also runs in seconds on CPU CI (same code path, same topology).
    tiny = "--tiny" in sys.argv
    batch_size = 8 if tiny else 32

    print(f"Running ResNet-18/MNIST on {jax.devices()[0].platform}"
          f"{' (tiny config)' if tiny else ''}")
    key = jax.random.PRNGKey(0)
    params = init_resnet18(
        key, num_classes=10, in_channels=1,
        width_scale=0.125 if tiny else 1.0,
    )
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    print(f"parameters: {n_params:,}")

    opt = HessianFree(
        params,
        model_fn=resnet18_apply,
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=5 if tiny else 50,  # demo budget; default is 250
    )

    data_dir = parse_data_dir()
    stream = (
        real_batch_stream(data_dir, batch_size=batch_size)
        if data_dir else None
    )
    if data_dir:
        print(f"streaming real data from {data_dir}")

    try:
        for step_idx in range(2):
            if stream is not None:
                batch = next(stream)
            else:
                key, kb = jax.random.split(key)
                batch = synthetic_mnist_batch(kb, batch_size=batch_size)
            if step_idx == 0:
                det = opt.test_deterministic(batch)
                print("determinism self-test:", det)
            t0 = time.perf_counter()
            opt.step(batch)
            dt = time.perf_counter() - t0
            report(step_idx, opt)
            print(f"         wall-clock {dt:.2f}s"
                  f"{' (incl. compile)' if step_idx == 0 else ''}")
    finally:
        if stream is not None:
            stream.close()
