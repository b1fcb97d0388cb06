"""Shared test fixtures (plain helpers, mirroring reference tests/test_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np


def get_linear_system(dim, seed=0, dtype=jnp.float32):
    """Random SPD system A = R R^T + 1e-3 I, b = A x_true
    (reference tests/test_utils.py:6-16)."""
    rng = np.random.default_rng(seed)
    R = jnp.asarray(rng.standard_normal((dim, dim)), dtype)
    A = R @ R.T + 1e-3 * jnp.eye(dim, dtype=dtype)
    x_true = jnp.asarray(rng.standard_normal((dim,)), dtype)
    b = A @ x_true
    return A, b, x_true


def init_small_nn(seed=0, dtype=jnp.float32, sizes=(7, 5, 5, 3)):
    """Small MLP test problem: 7 -> 5 -> 5 -> 3 with tanh, matching the
    reference's nested-Sequential MLP (reference tests/test_utils.py:19-52).

    Returns (params, model_fn, mse_loss).  The params pytree is a nested dict
    (the "nested Sequential" traversal analog).
    """
    rng = np.random.default_rng(seed)

    def layer(n_in, n_out):
        w = jnp.asarray(
            rng.standard_normal((n_in, n_out)) / np.sqrt(n_in), dtype
        )
        b = jnp.asarray(rng.standard_normal((n_out,)) * 0.1, dtype)
        return {"w": w, "b": b}

    params = {
        "l1": layer(sizes[0], sizes[1]),
        "inner": {  # nested sub-tree to exercise pytree traversal
            "l2": layer(sizes[1], sizes[2]),
            "l3": layer(sizes[2], sizes[3]),
        },
    }

    def model_fn(p, x):
        h = jnp.tanh(x @ p["l1"]["w"] + p["l1"]["b"])
        h = jnp.tanh(h @ p["inner"]["l2"]["w"] + p["inner"]["l2"]["b"])
        return h @ p["inner"]["l3"]["w"] + p["inner"]["l3"]["b"]

    def mse_loss(outputs, targets):
        return jnp.mean((outputs - targets) ** 2)

    return params, model_fn, mse_loss


def small_nn_batch(seed=0, N=16, dtype=jnp.float32, sizes=(7, 3)):
    rng = np.random.default_rng(seed + 1000)
    x = jnp.asarray(rng.standard_normal((N, sizes[0])), dtype)
    y = jnp.asarray(rng.standard_normal((N, sizes[1])), dtype)
    return x, y


def freeze_first_layer_mask(params):
    """Trainable mask freezing layer 1 (reference tests/test_utils.py:40-43)."""
    return jax.tree_util.tree_map(lambda _: True, params) | {
        "l1": {"w": False, "b": False}
    }


def dense_hessian(loss_of_vec, vec):
    """Dense Hessian oracle via jax.hessian on the flat vector."""
    return jax.hessian(loss_of_vec)(vec)
