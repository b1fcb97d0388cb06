"""Preconditioner tests.

Ports reference tests/test_preconditioners.py: the vmap and scan empirical-
Fisher diagonals must both equal the diagonal of the *dense* empirical Fisher
assembled from per-sample gradient outer products (:58-99, N in {1, 16},
both reductions), and the ``(D + damping)^(-exponent)`` closure must invert
against the explicit diagonal matrix (:104-127).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import (
    TrainableRavel,
    diag_EF,
    diag_EF_preconditioner,
    diag_EF_scan,
    diag_to_preconditioner,
)
from pytorchhessianfree_tpu.models.mlp import init_mlp, mlp_apply, mse_loss, mse_loss_sum

SEEDS = [0, 1, 42]


def _dense_empirical_fisher(model_fn, loss_outer, params, x, y, reduction, ravel):
    """Dense oracle: sum_i g_i g_i^T built from per-sample gradients
    (reference tests/test_preconditioners.py:15-36)."""
    N = x.shape[0]
    G = []
    for i in range(N):
        g = jax.grad(
            lambda p: loss_outer(model_fn(p, x[i : i + 1]), y[i : i + 1])
        )(params)
        G.append(np.asarray(ravel.ravel(g)))
    G = np.stack(G)
    F = G.T @ G
    if reduction == "mean":
        F = F / N
    return F


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("N", [1, 16])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_diag_EF_matches_dense_oracle(seed, N, reduction):
    key = jax.random.PRNGKey(seed)
    params = init_mlp(key, dtype=jnp.float64)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (N, 7), jnp.float64)
    y = jax.random.normal(ky, (N, 3), jnp.float64)
    loss_outer = mse_loss if reduction == "mean" else mse_loss_sum
    ravel = TrainableRavel(params)

    F = _dense_empirical_fisher(
        mlp_apply, loss_outer, params, x, y, reduction, ravel
    )
    d_vmap = diag_EF(mlp_apply, loss_outer, params, x, y, reduction, ravel)
    d_scan = diag_EF_scan(mlp_apply, loss_outer, params, x, y, reduction, ravel)

    np.testing.assert_allclose(np.asarray(d_vmap), np.diag(F), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d_scan), np.diag(F), atol=1e-10)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("exponent", [0.75, 1.0])
def test_diag_to_preconditioner_inverts(seed, exponent):
    """P @ M_func(v) == v where P = diag((d + damping)^exponent)
    (reference tests/test_preconditioners.py:104-127)."""
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.random(20) + 0.1, jnp.float64)
    damping = 0.3
    v = jnp.asarray(rng.standard_normal(20), jnp.float64)

    M = diag_to_preconditioner(d, damping, exponent)
    P = np.diag(np.asarray((d + damping) ** exponent))
    np.testing.assert_allclose(P @ np.asarray(M(v)), np.asarray(v), atol=1e-12)


def test_diag_EF_preconditioner_returns_closure_and_diag():
    """The composed wrapper must RETURN its preconditioner -- the fix for the
    reference's get_preconditioner bug (reference optimizer.py:943-952, no
    return statement)."""
    key = jax.random.PRNGKey(0)
    params = init_mlp(key)
    x = jax.random.normal(key, (8, 7))
    y = jax.random.normal(key, (8, 3))

    M, diag = diag_EF_preconditioner(
        mlp_apply, mse_loss, params, x, y, "mean", damping=0.5
    )
    assert M is not None and diag is not None
    v = jnp.ones_like(diag)
    np.testing.assert_allclose(
        np.asarray(M(v)), np.asarray((diag + 0.5) ** -0.75), rtol=1e-6
    )


def test_diag_EF_invalid_reduction():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key)
    x = jax.random.normal(key, (4, 7))
    y = jax.random.normal(key, (4, 3))
    ravel = TrainableRavel(params)
    with pytest.raises(ValueError):
        diag_EF(mlp_apply, mse_loss, params, x, y, "median", ravel)
