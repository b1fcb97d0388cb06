"""Solver-state-sharded Hessian-free training over a 2-D (data x model) mesh.

Demonstrates the ZeRO/FSDP-style scaling mode that has no reference analog
(the reference keeps the full CG iterate grid on one GPU,
reference cg.py:152-170): the batch is data-parallel over the `data` axis
while every flat CG vector and the iterate-storage grid -- the optimizer's
largest buffers -- shard over the `model` axis.  Optionally the weights
themselves are tensor-parallel (`--tp`).

Run with `--cpu` on any machine (8 virtual host devices); on a real mesh the
same code lays the collectives over ICI.
"""

import sys

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested, get_small_nn_problem

force_cpu_if_requested()

from jax.sharding import PartitionSpec as P

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
)
from pytorchhessianfree_tpu.models import mlp_apply, mse_loss
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

SIZES = (7, 16, 16, 4)

if __name__ == "__main__":
    n_dev = jax.device_count()
    if n_dev < 2:
        print(f"only {n_dev} device(s); run with --cpu for 8 virtual devices")
        sys.exit(0)

    mesh = make_mesh(n_dev, axis_names=("data", "model"))
    print(
        f"Running sharded HF on {n_dev} {jax.devices()[0].platform} "
        f"device(s), mesh {dict(mesh.shape)}"
    )

    key = jax.random.PRNGKey(0)
    params, _ = get_small_nn_problem(key, N=32, sizes=SIZES)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=50)
    # the model-axis size must divide the padded flat dimension
    ravel = TrainableRavel(params, pad_to_multiple=64)

    param_specs = None
    if "--tp" in sys.argv:
        # tensor parallelism: output-feature dimension over the model axis
        param_specs = {
            "layers": [
                {"w": P(None, "model"), "b": P("model")}
                for _ in range(len(SIZES) - 1)
            ]
        }
        print("weights sharded tensor-parallel over the model axis")

    step = make_sharded_hf_step(
        fns, config, ravel, mesh, param_specs=param_specs
    )

    state = init_state(ravel, config)
    for i in range(4):
        key, kb = jax.random.split(key)
        _, batch = get_small_nn_problem(kb, N=32, sizes=SIZES)
        params, state, stats = step(params, state, batch)
        print(
            f"step {i}: loss {float(stats.init_loss):.6f} -> "
            f"{float(stats.final_loss):.6f} | cg {int(stats.num_cg_iters)} "
            f"| damping {float(stats.damping):.4f}"
        )

    print(f"warm-start sharding: {state.x0.sharding.spec}")
    w0 = params["layers"][0]["w"]
    print(f"layer-0 weight sharding: {w0.sharding.spec}")
    print("done.")
