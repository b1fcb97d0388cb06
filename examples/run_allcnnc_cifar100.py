"""All-CNN-C on (synthetic) CIFAR-100 with L2-regularized cross-entropy,
optionally data-parallel over the device mesh
(the analog of reference examples/run_allcnnc_cifar100_deepobs.py; the
reference's sequential acc_step becomes mesh data parallelism here).

Usage:
    python run_allcnnc_cifar100.py          # single device
    python run_allcnnc_cifar100.py --dp     # data-parallel over all devices
    python run_allcnnc_cifar100.py --cpu --dp   # 8 virtual CPU devices
    python run_allcnnc_cifar100.py --data <dir>  # real CIFAR-100 from
        # <dir>/train_x.npy (float32 [N,32,32,3], DeepOBS-standardized) +
        # <dir>/train_y.npy (int [N]); under --dp batches are pre-sharded
        # over the mesh during the background transfer.
"""

import sys
import time

import jax
from example_utils import (
    force_cpu_if_requested,
    parse_data_dir,
    real_batch_stream,
    synthetic_cifar100_batch,
)

force_cpu_if_requested()

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    allcnnc_apply,
    cross_entropy_loss,
    init_allcnnc,
    l2_regularizer,
)
from pytorchhessianfree_tpu.parallel.data_parallel import make_dp_hf_step
from pytorchhessianfree_tpu.parallel.mesh import make_mesh

if __name__ == "__main__":
    data_parallel = "--dp" in sys.argv
    # --tiny: width-scaled model + small batch/CG budget for CPU CI.
    tiny = "--tiny" in sys.argv
    print(
        f"Running All-CNN-C/CIFAR-100 on {jax.device_count()} "
        f"{jax.devices()[0].platform} device(s), dp={data_parallel}"
        f"{', tiny config' if tiny else ''}"
    )
    key = jax.random.PRNGKey(0)
    params = init_allcnnc(
        key, num_classes=100, width_scale=0.125 if tiny else 1.0
    )

    # L2-regularized loss (DeepOBS style, reference
    # examples/run_allcnnc_cifar100_deepobs.py:23-31): loss_reg enters the
    # gradient, the LM reduction ratio, CG-backtracking and the line search,
    # while GGN curvature keeps flowing through the outputs only (an
    # additive params-only term has zero curvature through the outputs --
    # the reference's exact behavior with a regularized forward closure).
    fns = HFModelFns(
        model_fn=allcnnc_apply,
        loss_outer=cross_entropy_loss,
        loss_reg=l2_regularizer,
    )
    config = HFConfig(damping=1.0, cg_max_iter=5 if tiny else 50)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    state = init_state(ravel, config)

    if data_parallel:
        mesh = make_mesh()
        step = make_dp_hf_step(fns, config, ravel, mesh)
    else:
        step = make_hf_step(fns, config, ravel)

    per_device = 8 if tiny else 32
    batch_size = per_device * (jax.device_count() if data_parallel else 1)

    data_dir = parse_data_dir()
    stream = None
    if data_dir:
        sharding = None
        if data_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # batches arrive on device already sharded over the data axis
            sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        stream = real_batch_stream(data_dir, batch_size, sharding=sharding)
        print(f"streaming real data from {data_dir}")

    try:
        for step_idx in range(2):
            if stream is not None:
                batch = next(stream)
            else:
                key, kb = jax.random.split(key)
                batch = synthetic_cifar100_batch(kb, batch_size=batch_size)
            t0 = time.perf_counter()
            params, state, stats = step(params, state, batch)
            jax.block_until_ready(params)
            dt = time.perf_counter() - t0
            print(
                f"step {step_idx}: loss {float(stats.init_loss):.4f} -> "
                f"{float(stats.final_loss):.4f} | cg "
                f"{int(stats.num_cg_iters)} | "
                f"lr {float(stats.lr):.4f} | {dt:.2f}s"
                f"{' (incl. compile)' if step_idx == 0 else ''}"
            )
    finally:
        if stream is not None:
            stream.close()
