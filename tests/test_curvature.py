"""Curvature-matvec parity against dense oracles.

Mirrors the reference's dense-ground-truth test style
(reference tests/test_preconditioners.py:15-36): the HVP must match the full
Hessian of the loss, the GGN-VP must match the explicitly assembled
J^T H_L J on a small MLP (SURVEY.md build plan step 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import TrainableRavel, ggnvp_fn, hvp_fn
from test_utils_hf import (
    freeze_first_layer_mask,
    init_small_nn,
    small_nn_batch,
)

SEEDS = [0, 1, 42]


def _flat_loss_setup(seed, freeze=False, dtype=jnp.float64):
    params, model_fn, mse = init_small_nn(seed, dtype=dtype)
    x, y = small_nn_batch(seed, N=8, dtype=dtype)
    mask = freeze_first_layer_mask(params) if freeze else None
    ravel = TrainableRavel(params, mask)

    def loss_of_vec(vec):
        return mse(model_fn(ravel.write(params, vec), x), y)

    def model_of_vec(vec):
        return model_fn(ravel.write(params, vec), x)

    return params, model_fn, mse, x, y, ravel, loss_of_vec, model_of_vec


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("freeze", [False, True])
def test_hvp_matches_dense_hessian(seed, freeze):
    params, model_fn, mse, x, y, ravel, loss_of_vec, _ = _flat_loss_setup(
        seed, freeze
    )
    H = jax.hessian(loss_of_vec)(ravel.ravel(params))

    def loss_of_params(p):
        return mse(model_fn(p, x), y)

    loss, grad, hvp = hvp_fn(loss_of_params, params)

    # gradient parity too
    g_dense = jax.grad(loss_of_vec)(ravel.ravel(params))
    np.testing.assert_allclose(
        np.asarray(ravel.ravel(grad)), np.asarray(g_dense), atol=1e-10
    )

    rng = np.random.default_rng(seed)
    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(ravel.dim), ravel.dtype)
        Hv = ravel.ravel(hvp(ravel.unravel(v)))
        np.testing.assert_allclose(
            np.asarray(Hv), np.asarray(H @ v), atol=1e-9
        )


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("freeze", [False, True])
def test_ggnvp_matches_dense_ggn(seed, freeze):
    params, model_fn, mse, x, y, ravel, _, model_of_vec = _flat_loss_setup(
        seed, freeze
    )

    # Dense GGN = J^T H_L J with J the model Jacobian w.r.t. the flat params
    # and H_L the Hessian of the loss w.r.t. the (flattened) outputs.
    vec0 = ravel.ravel(params)
    out0 = model_of_vec(vec0)
    J = jax.jacobian(lambda v: jnp.ravel(model_of_vec(v)))(vec0)
    HL = jax.hessian(lambda o: mse(o.reshape(out0.shape), y))(jnp.ravel(out0))
    G = J.T @ HL @ J

    loss, outputs, grad, ggnvp = ggnvp_fn(
        lambda p: model_fn(p, x), lambda o: mse(o, y), params
    )

    rng = np.random.default_rng(seed)
    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(ravel.dim), ravel.dtype)
        Gv = ravel.ravel(ggnvp(ravel.unravel(v)))
        np.testing.assert_allclose(
            np.asarray(Gv), np.asarray(G @ v), atol=1e-9
        )


@pytest.mark.parametrize("seed", SEEDS)
def test_ggn_equals_hessian_for_linear_model(seed):
    """For a linear model + MSE the GGN and the Hessian coincide exactly."""
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.standard_normal((4, 3)), jnp.float64)
    params = {"w": W}
    x = jnp.asarray(rng.standard_normal((10, 4)), jnp.float64)
    y = jnp.asarray(rng.standard_normal((10, 3)), jnp.float64)

    def model_fn(p, inputs):
        return inputs @ p["w"]

    def mse(o, t):
        return jnp.mean((o - t) ** 2)

    ravel = TrainableRavel(params)
    _, _, _, ggnvp = ggnvp_fn(
        lambda p: model_fn(p, x), lambda o: mse(o, y), params
    )
    _, _, hvp = hvp_fn(lambda p: mse(model_fn(p, x), y), params)

    v = jnp.asarray(rng.standard_normal(ravel.dim), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(ravel.ravel(ggnvp(ravel.unravel(v)))),
        np.asarray(ravel.ravel(hvp(ravel.unravel(v)))),
        atol=1e-12,
    )
