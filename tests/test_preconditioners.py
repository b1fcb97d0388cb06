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


def test_auto_precond_matches_manual():
    """HFConfig(precond='diag_ef') -- the in-step automatic preconditioner --
    must produce the same update as manually passing the same batch's
    empirical-Fisher diagonal (the reference's get_preconditioner flow)."""
    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        init_state,
        make_hf_step,
    )

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    ravel = TrainableRavel(params)
    x = jax.random.normal(key, (16, 7), jnp.float64)
    y = jax.random.normal(key, (16, 3), jnp.float64)

    cfg_auto = HFConfig(damping=0.5, cg_max_iter=30, precond="diag_ef")
    cfg_man = HFConfig(damping=0.5, cg_max_iter=30)
    p_a, _, st_a = make_hf_step(fns, cfg_auto, ravel)(
        params, init_state(ravel, cfg_auto), (x, y)
    )
    diag = diag_EF(mlp_apply, mse_loss, params, x, y, "mean", ravel)
    p_m, _, st_m = make_hf_step(fns, cfg_man, ravel)(
        params, init_state(ravel, cfg_man), (x, y), precond_diag=diag
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_m)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    assert int(st_a.num_cg_iters) == int(st_m.num_cg_iters)


def test_auto_precond_requires_split_form():
    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel as TR,
        init_state,
        hf_step,
    )

    params = {"x": jnp.ones(3)}
    fns = HFModelFns(loss_fn=lambda p, b: jnp.sum(p["x"] ** 2))
    cfg = HFConfig(
        curvature_opt="hessian", damping=0.5, precond="diag_ef",
        cg_max_iter=5,
    )
    ravel = TR(params)
    with pytest.raises(ValueError):
        hf_step(params, init_state(ravel, cfg), None,
                fns=fns, config=cfg, ravel=ravel)


def test_ema_diag():
    """EMA-smoothed preconditioner diagonal across steps."""
    from pytorchhessianfree_tpu.ops.precond import EMADiag

    e = EMADiag(decay=0.5)
    d1 = jnp.asarray([2.0, 4.0])
    d2 = jnp.asarray([4.0, 8.0])
    np.testing.assert_array_equal(np.asarray(e.update(d1)), [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(e.update(d2)), [3.0, 6.0])
    with pytest.raises(ValueError):
        EMADiag(decay=1.5)

    # end-to-end: EMA diag drives a preconditioned HF step
    from pytorchhessianfree_tpu import HessianFree

    key = jax.random.PRNGKey(0)
    params = init_mlp(key)
    opt = HessianFree(
        params, model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5
    )
    ema = EMADiag(decay=0.9)
    x = jax.random.normal(key, (8, 7), jnp.float32)
    y = jax.random.normal(key, (8, 3), jnp.float32)
    for _ in range(2):
        diag = opt.get_preconditioner(x, y, reduction="mean")
        loss = opt.step((x, y), precond_diag=ema.update(diag))
    assert np.isfinite(loss)


def test_diag_EF_invalid_reduction():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key)
    x = jax.random.normal(key, (4, 7))
    y = jax.random.normal(key, (4, 3))
    ravel = TrainableRavel(params)
    with pytest.raises(ValueError):
        diag_EF(mlp_apply, mse_loss, params, x, y, "median", ravel)


def test_diag_ef_pytree_targets():
    """diag_EF / diag_EF_scan work with pytree targets -- the (targets,
    weights) layout of weighted_fns (used to crash on y[None])."""
    from pytorchhessianfree_tpu.accumulate import weighted_fns
    from pytorchhessianfree_tpu.models.mlp import (
        init_mlp,
        mlp_apply,
        mse_per_sample,
    )
    from pytorchhessianfree_tpu.ops.precond import diag_EF, diag_EF_scan

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (8, 7), jnp.float64)
    y = jax.random.normal(ky, (8, 3), jnp.float64)
    w = jnp.ones((8,), jnp.float64)

    ravel = TrainableRavel(params)
    fns = weighted_fns(mlp_apply, mse_per_sample, total=8, reduction="mean")

    got = diag_EF(
        fns.model_fn, fns.loss_outer, params, x, (y, w), "mean", ravel
    )
    got_scan = diag_EF_scan(
        fns.model_fn, fns.loss_outer, params, x, (y, w), "mean", ravel
    )
    # all-ones weights with total=N: per-sample loss is mse_per_sample/N,
    # so the diag equals the plain mse diag scaled by 1/N^2
    from pytorchhessianfree_tpu.models.mlp import mse_loss

    want = diag_EF(mlp_apply, mse_loss, params, x, y, "mean", ravel) / 64.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(got_scan), np.asarray(want), rtol=1e-10
    )
