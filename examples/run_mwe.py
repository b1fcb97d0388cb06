"""Minimal working example: the Hessian-free optimizer on a small MLP and
dummy data (the analog of reference examples/run_mwe.py)."""

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested, report

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree

BATCH_SIZE = 16
DIM = 10

if __name__ == "__main__":
    print(f"Running MWE on {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)

    # Model: Linear(10->10, no bias) -> ReLU -> Linear(10->10), MSE loss.
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (DIM, DIM)) / jnp.sqrt(DIM),
        "l2": {
            "w": jax.random.normal(k2, (DIM, DIM)) / jnp.sqrt(DIM),
            "b": jnp.zeros((DIM,)),
        },
    }

    def model_fn(p, x):
        h = jax.nn.relu(x @ p["w1"])
        return h @ p["l2"]["w"] + p["l2"]["b"]

    def mse(outputs, targets):
        return jnp.mean((outputs - targets) ** 2)

    opt = HessianFree(params, model_fn=model_fn, loss_outer=mse)

    for step_idx in range(5):
        key, kx, ky = jax.random.split(key, 3)
        inputs = jax.random.uniform(kx, (BATCH_SIZE, DIM))
        targets = jax.random.uniform(ky, (BATCH_SIZE, DIM))
        opt.step((inputs, targets))
        report(step_idx, opt)
