"""Opt-in solver-depth observability (HFConfig.rich_stats).

VERDICT r1 item #5: surface the CG m-history, the evaluated backtracking
candidates and the line-search alpha trace from the step (the data behind
the reference's verbose tables, reference cg.py:202-203,
cg_backtracking.py:100-110, linesearch.py:57-102).  The key test checks the
returned m-history against an independent NumPy CG oracle through the FULL
step API.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    format_rich_stats,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models.mlp import init_mlp, mlp_apply, mse_loss


def _problem(seed=0, N=12):
    key = jax.random.PRNGKey(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, dtype=jnp.float64)
    x = jax.random.normal(kx, (N, 7), jnp.float64)
    y = jax.random.normal(ky, (N, 3), jnp.float64)
    return params, x, y


def _np_cg_m_hist(A, b, max_iter, tol=1e-5):
    """Independent oracle: unpreconditioned Martens-terminated CG, returning
    the quadratic values m(x_i) = 0.5 x_i^T A x_i - b^T x_i per iteration."""
    x = np.zeros_like(b)
    r = A @ x - b
    m = [0.5 * x @ A @ x - b @ x]
    p = -r
    ry = r @ r
    it = 1
    while True:
        Ap = A @ p
        alpha = ry / (p @ Ap)
        x = x + alpha * p
        r = r + alpha * Ap
        m.append(0.5 * x @ A @ x - b @ x)
        k = max(10, it // 10)
        if k < it and (m[it] - m[it - k]) / (m[it] - m[0]) < 5e-4:
            break
        if it >= max_iter:
            break
        if np.linalg.norm(r) < tol * np.linalg.norm(b):
            break
        ry_new = r @ r
        p = -r + (ry_new / ry) * p
        ry = ry_new
        it += 1
    return np.asarray(m), it


def test_m_hist_matches_numpy_oracle_through_full_step():
    """HFStats.detail.m_hist through the full jitted step == the m-values of
    an independent dense-matrix NumPy CG on the same damped GGN system."""
    from pytorchhessianfree_tpu.optimizer import _build_matvec_and_grad

    params, x, y = _problem(0)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.3, cg_max_iter=25, rich_stats=True)
    ravel = TrainableRavel(params)

    # dense damped curvature for the oracle
    _, grad, mvp = _build_matvec_and_grad(
        fns, config, ravel, params, (x, y)
    )
    eye = np.eye(ravel.dim)
    A = np.stack([np.asarray(mvp(jnp.asarray(eye[i]))) for i in range(ravel.dim)]).T
    A = A + 0.3 * eye
    b = -np.asarray(grad)

    step = make_hf_step(fns, config, ravel)
    _, _, stats = step(params, init_state(ravel, config), (x, y))

    m_oracle, iters = _np_cg_m_hist(A, b, 25)
    num = int(stats.num_cg_iters)
    assert num == iters
    np.testing.assert_allclose(
        np.asarray(stats.detail.m_hist)[: num + 1], m_oracle, atol=1e-9
    )
    # m_final consistency with the LM heuristic inputs
    np.testing.assert_allclose(
        float(stats.detail.m_hist[num]), m_oracle[-1], atol=1e-9
    )


def test_backtracking_and_linesearch_traces():
    params, x, y = _problem(1)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.3, cg_max_iter=25, rich_stats=True)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    _, _, stats = step(params, init_state(ravel, config), (x, y))
    d = stats.detail

    cand = np.asarray(d.cand_iters)
    bt = np.asarray(d.bt_f)
    num = int(stats.num_cg_iters)
    assert cand[-1] == num  # last candidate is the final iterate
    assert not np.isnan(bt[-1])  # final iterate is always evaluated
    # the chosen iterate's loss is the minimum of the evaluated candidates
    best = int(stats.best_cg_iter)
    evaluated = bt[~np.isnan(bt)]
    chosen_mask = (cand == best) & ~np.isnan(bt)
    assert chosen_mask.any()
    np.testing.assert_allclose(bt[chosen_mask][-1], evaluated.min())

    al = np.asarray(d.ls_alphas)
    fl = np.asarray(d.ls_f)
    tried = ~np.isnan(al)
    assert tried.any()
    # first trial is init_alpha = lr config default 1.0
    assert al[0] == 1.0
    # the accepted alpha/loss match the step stats
    np.testing.assert_allclose(al[tried][-1], float(stats.lr))
    np.testing.assert_allclose(fl[tried][-1], float(stats.final_loss))

    text = format_rich_stats(stats)
    assert "CG m-history" in text and "Backtracking" in text
    assert "<-- chosen" in text and "<-- accepted" in text


def test_batched_modes_trace_consistency():
    """Batched backtracking/line-search must record the same accepted
    alpha/candidate; batched traces evaluate every candidate (no NaN holes
    below the final iterate)."""
    params, x, y = _problem(2)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    ravel = TrainableRavel(params)
    from pytorchhessianfree_tpu.config import LineSearchConfig

    cfg_s = HFConfig(damping=0.3, cg_max_iter=25, rich_stats=True)
    cfg_b = HFConfig(
        damping=0.3, cg_max_iter=25, rich_stats=True,
        backtracking_mode="batched",
        linesearch=LineSearchConfig(mode="batched"),
    )
    _, _, st_s = make_hf_step(fns, cfg_s, ravel)(
        params, init_state(ravel, cfg_s), (x, y)
    )
    _, _, st_b = make_hf_step(fns, cfg_b, ravel)(
        params, init_state(ravel, cfg_b), (x, y)
    )
    assert int(st_s.best_cg_iter) == int(st_b.best_cg_iter)
    np.testing.assert_allclose(float(st_s.lr), float(st_b.lr))
    # where the sequential walk evaluated, the values agree
    bs, bb = np.asarray(st_s.detail.bt_f), np.asarray(st_b.detail.bt_f)
    mask = ~np.isnan(bs)
    np.testing.assert_allclose(bs[mask], bb[mask], rtol=1e-12)


def test_detail_none_by_default_and_scan_compatible():
    params, x, y = _problem(3)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    ravel = TrainableRavel(params)

    config = HFConfig(damping=0.3, cg_max_iter=15)
    _, _, stats = make_hf_step(fns, config, ravel)(
        params, init_state(ravel, config), (x, y)
    )
    assert stats.detail is None

    # rich stats through the scanned train loop: leading steps axis
    from pytorchhessianfree_tpu import make_hf_train_loop

    config_r = HFConfig(damping=0.3, cg_max_iter=15, rich_stats=True)
    loop = make_hf_train_loop(fns, config_r, ravel)
    xs = jnp.stack([x, x]); ys = jnp.stack([y, y])
    _, _, stats = loop(params, init_state(ravel, config_r), (xs, ys))
    assert stats.detail.m_hist.shape == (2, 16)
    assert stats.detail.bt_f.shape[0] == 2


def test_ls_trace_shape_parity_without_linesearch():
    """With compute_final_loss=True and no line search, the fused and
    standalone paths must expose the SAME (empty) line-search trace --
    stats shapes may not depend on the fused_trials performance flag."""
    import dataclasses

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    kx, ky = jax.random.split(key)
    batch = (
        jax.random.normal(kx, (16, 7), jnp.float64),
        jax.random.normal(ky, (16, 3), jnp.float64),
    )
    ravel = TrainableRavel(params)

    shapes = {}
    for fused in (True, False):
        config = HFConfig(
            damping=0.5, cg_max_iter=20, use_linesearch=False,
            compute_final_loss=True, rich_stats=True, fused_trials=fused,
        )
        step = make_hf_step(fns, config, ravel)
        _, _, st = step(params, init_state(ravel, config), batch)
        shapes[fused] = (st.detail.ls_alphas.shape, st.detail.ls_f.shape)
    assert shapes[True] == shapes[False] == ((0,), (0,))

    # ... and with backtracking ALSO off, the bt_f record agrees too (the
    # LM heuristic's f(final) lands in the final-candidate slot either way)
    bt = {}
    for fused in (True, False):
        config = HFConfig(
            damping=0.5, cg_max_iter=20, use_linesearch=False,
            use_cg_backtracking=False, compute_final_loss=False,
            rich_stats=True, fused_trials=fused,
        )
        step = make_hf_step(fns, config, ravel)
        _, _, st = step(params, init_state(ravel, config), batch)
        bt[fused] = np.asarray(st.detail.bt_f)
    assert bt[True].shape == bt[False].shape
    np.testing.assert_allclose(bt[True], bt[False], rtol=1e-12)
    assert np.isfinite(bt[True][-1])  # f(final iterate) recorded
