"""End-to-end production pipeline: every runtime piece composing.

C++ prefetch loader (shuffled batch assembly on background threads, native
int labels) -> DevicePrefetcher (host->device transfer overlapped with
compute, batches arrive pre-sharded when a mesh is used) -> the stateful
HessianFree optimizer with in-step empirical-Fisher preconditioning.

The reference's equivalent is torch DataLoader workers + blocking
``.to(device)`` + manual get_preconditioner calls
(reference examples/run_allcnnc_cifar100_deepobs.py:55-75); here each
stage overlaps the previous one and the whole optimizer step is a single
device program.

Run with `--cpu` anywhere; without it, steps run on the TPU.
"""

import numpy as np
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

import jax

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import cross_entropy_loss, mlp_apply
from pytorchhessianfree_tpu.models.mlp import init_mlp
from pytorchhessianfree_tpu.runtime import DevicePrefetcher, PrefetchLoader

N, DIM, CLASSES, BATCH, STEPS = 4096, 20, 5, 128, 8

if __name__ == "__main__":
    print(f"Running pipeline on {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)

    # synthetic teacher-labeled dataset with native int32 labels
    key = jax.random.PRNGKey(1)
    teacher = init_mlp(key, sizes=(DIM, 32, 32, CLASSES))
    inputs = rng.standard_normal((N, DIM)).astype(np.float32)
    labels = np.asarray(
        jax.vmap(lambda x: mlp_apply(teacher, x[None])[0].argmax())(
            jax.numpy.asarray(inputs)
        ),
        dtype=np.int32,
    )

    loader = PrefetchLoader(
        inputs, labels, batch_size=BATCH, seed=7, depth=4, num_threads=2
    )
    print(
        f"loader: {loader.batches_per_epoch} batches/epoch, "
        f"labels dtype {labels.dtype} (no float round-trip)"
    )

    params = init_mlp(jax.random.PRNGKey(2), sizes=(DIM, 32, 32, CLASSES))
    opt = HessianFree(
        params,
        model_fn=mlp_apply,
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=30,
        precond="diag_ef",  # EF diagonal computed inside the jitted step
    )

    with DevicePrefetcher(loader, depth=2, n_batches=STEPS) as batches:
        for i, batch in enumerate(batches):
            final_loss = opt.step(batch)
            h = opt.history
            print(
                f"step {i}: loss {h['init_losses'][-1]:.4f} -> "
                f"{final_loss:.4f} | cg {h['num_cg_iters'][-1]} "
                f"({h['cg_reasons'][-1]})"
            )

    loader.close()
    assert opt.history["init_losses"][-1] < opt.history["init_losses"][0]
    print("loss decreased through the full pipeline; done.")
