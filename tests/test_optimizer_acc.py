"""Accumulated-step tests.

Ports reference tests/test_optimizer_acc.py: the reduction self-test must
pass for the true reduction and raise for the wrong one (:81-109), and the
``step`` / ``acc_step`` parameter trajectories must coincide (atol 1e-4) when
acc_step runs on a chunked version of step's batch (:124-175) -- for both a
single-chunk list and a ragged [7, 8] split, and additionally for the
stacked/scan layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models.mlp import (
    init_mlp,
    mlp_apply,
    mse_loss,
    mse_loss_sum,
)

SEEDS = [0, 1, 42]
CURV_OPTS = ["hessian", "ggn"]


def _problem(seed, N=16, dtype=jnp.float64):
    key = jax.random.PRNGKey(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, dtype=dtype)
    x = jax.random.normal(kx, (N, 7), dtype)
    y = jax.random.normal(ky, (N, 3), dtype)
    return params, x, y


def _new_opt(params, curvature_opt, loss_outer=mse_loss):
    return HessianFree(
        params,
        model_fn=mlp_apply,
        loss_outer=loss_outer,
        curvature_opt=curvature_opt,
        damping=0.5,
        cg_max_iter=50,
    )


def _params_allclose(p1, p2, atol):
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_test_reduction(seed, reduction):
    """Correct reduction passes; the wrong one raises RuntimeError
    (reference tests/test_optimizer_acc.py:81-109)."""
    params, x, y = _problem(seed)
    loss_outer = mse_loss if reduction == "mean" else mse_loss_sum
    opt = _new_opt(params, "ggn", loss_outer)

    datalist = [(x[:7], y[:7]), (x[7:], y[7:])]
    opt.test_reduction(datalist, reduction)

    wrong = "sum" if reduction == "mean" else "mean"
    with pytest.raises(RuntimeError):
        opt.test_reduction(datalist, wrong)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("curvature_opt", CURV_OPTS)
@pytest.mark.parametrize("split", ["single", "ragged", "stacked"])
def test_step_equals_acc_step(seed, curvature_opt, split):
    """Two identical models -- one driven by step on the concatenated batch,
    one by acc_step on the chunked datalist -- must follow the same parameter
    trajectory for 3 steps within atol 1e-4
    (reference tests/test_optimizer_acc.py:124-175, N_list [16] and [7, 8])."""
    params, _, _ = _problem(seed)
    opt_a = _new_opt(params, curvature_opt)
    opt_b = _new_opt(params, curvature_opt)

    for i in range(3):
        _, x, y = _problem(seed * 100 + i + 1)
        opt_a.step((x, y))

        if split == "single":
            datalist = [(x, y)]
        elif split == "ragged":
            datalist = [(x[:7], y[:7]), (x[7:], y[7:])]
        else:  # stacked [2, 8, ...] chunks for the lax.scan path
            datalist = (
                x.reshape(2, 8, *x.shape[1:]),
                y.reshape(2, 8, *y.shape[1:]),
            )
        opt_b.acc_step(datalist, reduction="mean")

        _params_allclose(opt_a.params, opt_b.params, atol=1e-4)

    # Stats histories must agree too (same trajectory => same diagnostics).
    np.testing.assert_allclose(
        opt_a.history["init_losses"], opt_b.history["init_losses"], atol=1e-6
    )
    assert opt_a.history["num_cg_iters"] == opt_b.history["num_cg_iters"]


@pytest.mark.parametrize("seed", [0])
def test_acc_step_independent_datalists(seed):
    """grad/mvp datalists may differ from the loss datalist
    (reference optimizer.py:554-559)."""
    params, x, y = _problem(seed, N=24)
    opt = _new_opt(params, "ggn")
    loss_data = [(x[:8], y[:8]), (x[8:16], y[8:16]), (x[16:], y[16:])]
    grad_data = [(x[:12], y[:12]), (x[12:], y[12:])]
    mvp_data = [(x[:6], y[:6]), (x[6:12], y[6:12])]
    final = opt.acc_step(
        loss_data, grad_data=grad_data, mvp_data=mvp_data, reduction="mean"
    )
    assert np.isfinite(final)
    assert int(opt.state.step_count) == 1


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_amortized_acc_mvp_matches_per_chunk(reduction):
    """amortize=True (one linearization across all chunks) must equal the
    per-chunk re-linearized matvec to fp round-off."""
    from pytorchhessianfree_tpu import HFConfig, HFModelFns, TrainableRavel
    from pytorchhessianfree_tpu import HFConfig, HFModelFns, TrainableRavel
    from pytorchhessianfree_tpu.accumulate import make_acc_mvp

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5)
    ravel = TrainableRavel(params)
    xs = jax.random.normal(key, (3, 8, 7), jnp.float64)
    ys = jax.random.normal(key, (3, 8, 3), jnp.float64)
    v = jax.random.normal(key, (ravel.dim,), jnp.float64)

    plain = make_acc_mvp(fns, config, params, (xs, ys), reduction, ravel)(v)
    amort = make_acc_mvp(
        fns, config, params, (xs, ys), reduction, ravel, amortize=True
    )(v)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(amort), atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_padded_scan_matches_ragged_unrolled(seed, reduction):
    """Padded-stacked datalist (scan path, per-sample weights) must follow
    the same trajectory as the unrolled ragged datalist -- the jit-friendly
    form of the reference's differing-chunk-size semantics
    (reference optimizer.py:554-559, :678-684)."""
    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        hf_acc_step,
        init_state,
    )
    from pytorchhessianfree_tpu.accumulate import (
        pad_ragged_datalist,
        weighted_fns,
    )
    from pytorchhessianfree_tpu.models.mlp import mse_per_sample

    params, x, y = _problem(seed, N=16)
    loss_outer = mse_loss if reduction == "mean" else mse_loss_sum
    ragged = [(x[:5], y[:5]), (x[5:12], y[5:12]), (x[12:], y[12:])]

    config = HFConfig(damping=0.5, cg_max_iter=40)
    ravel = TrainableRavel(params)

    # A: unrolled ragged path
    fns_a = HFModelFns(model_fn=mlp_apply, loss_outer=loss_outer)
    p_a, s_a, stats_a = hf_acc_step(
        params,
        init_state(ravel, config),
        fns=fns_a,
        config=config,
        ravel=ravel,
        loss_data=ragged,
        reduction=reduction,
    )

    # B: padded stacked path (scan) with per-sample weights
    def per_sample(o, t):
        ps = mse_per_sample(o, t)
        return ps if reduction == "mean" else ps * o.shape[-1]

    xs, ys, w, total = pad_ragged_datalist(ragged)
    fns_b = weighted_fns(mlp_apply, per_sample, total, reduction)
    p_b, s_b, stats_b = hf_acc_step(
        params,
        init_state(ravel, config),
        fns=fns_b,
        config=config,
        ravel=ravel,
        loss_data=(xs, (ys, w)),
        reduction="sum",  # the weighted form bakes the normalization in
    )

    np.testing.assert_allclose(
        float(stats_a.init_loss), float(stats_b.init_loss), rtol=1e-12
    )
    # padded weighted sums reorder the fp reductions; CG amplifies the
    # last-bit difference slightly over its iterations
    _params_allclose(p_a, p_b, atol=1e-6)
    assert int(stats_a.num_cg_iters) == int(stats_b.num_cg_iters)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_acc_reduce_weighting(reduction):
    """Ragged-chunk weighted-sum semantics: result = sum N_i r_i / sum N_i
    for mean, plain sum for sum (reference optimizer.py:678-684)."""
    from pytorchhessianfree_tpu import acc_reduce

    data = [
        (jnp.zeros((3, 1)), jnp.full((3,), 2.0)),
        (jnp.zeros((5, 1)), jnp.full((5,), 10.0)),
    ]

    def eval_chunk(x, y):
        # per-chunk mean (reduction=mean semantics of a loss fn)
        return jnp.mean(y) if reduction == "mean" else jnp.sum(y)

    out = float(acc_reduce(data, eval_chunk, reduction))
    if reduction == "mean":
        np.testing.assert_allclose(out, (3 * 2.0 + 5 * 10.0) / 8)
    else:
        np.testing.assert_allclose(out, 3 * 2.0 + 5 * 10.0)


def test_concat_datalist_pytree_targets():
    """concat_datalist must handle pytree targets -- e.g. the padded-ragged
    (targets, weights) layout -- so check_reduction composes with
    weighted_fns (VERDICT r1 weak #8)."""
    from pytorchhessianfree_tpu.accumulate import concat_datalist

    data = [
        (jnp.ones((3, 2)), (jnp.zeros((3,)), jnp.ones((3,)))),
        (jnp.ones((5, 2)), (jnp.zeros((5,)), jnp.ones((5,)))),
    ]
    xs, ys = concat_datalist(data)
    assert xs.shape == (8, 2)
    assert ys[0].shape == (8,) and ys[1].shape == (8,)


def test_check_reduction_weighted_pytree_layout():
    """check_reduction must run (and pass) on the padded-ragged weighted
    layout the package itself produces via pad_ragged_datalist/weighted_fns."""
    from pytorchhessianfree_tpu import HFConfig, TrainableRavel
    from pytorchhessianfree_tpu.accumulate import (
        pad_ragged_datalist,
        weighted_fns,
    )
    from pytorchhessianfree_tpu.models.mlp import mse_per_sample
    from pytorchhessianfree_tpu.optimizer import check_reduction

    params, x, y = _problem(0, N=12)
    ragged = [(x[:5], y[:5]), (x[5:], y[5:])]
    xs, ys, w, total = pad_ragged_datalist(ragged)
    fns = weighted_fns(mlp_apply, mse_per_sample, total, "mean")
    ravel = TrainableRavel(params)
    check_reduction(
        fns, HFConfig(damping=0.5), ravel, params, (xs, (ys, w)), "sum"
    )


def test_stacked_data_wrapper_and_amortized_pytree_targets():
    """StackedData marks a stacked datalist explicitly; the amortized mvp
    path must accept pytree targets (ADVICE r1: _first_leaf in make_acc_mvp)."""
    from pytorchhessianfree_tpu import HFConfig, TrainableRavel
    from pytorchhessianfree_tpu.accumulate import (
        StackedData,
        acc_loss,
        make_acc_mvp,
        pad_ragged_datalist,
        weighted_fns,
    )
    from pytorchhessianfree_tpu.models.mlp import mse_per_sample

    params, x, y = _problem(0, N=12)
    ragged = [(x[:6], y[:6]), (x[6:], y[6:])]
    xs, ys, w, total = pad_ragged_datalist(ragged)
    fns = weighted_fns(mlp_apply, mse_per_sample, total, "mean")
    ravel = TrainableRavel(params)
    config = HFConfig(damping=0.5)

    data_plain = (xs, (ys, w))
    data_marked = StackedData(xs, (ys, w))
    np.testing.assert_allclose(
        float(acc_loss(fns, params, data_plain, "sum")),
        float(acc_loss(fns, params, data_marked, "sum")),
        rtol=1e-12,
    )

    v = jax.random.normal(jax.random.PRNGKey(3), (ravel.dim,), jnp.float64)
    mv_plain = make_acc_mvp(
        fns, config, params, data_plain, "sum", ravel, amortize=False
    )(v)
    mv_amort = make_acc_mvp(
        fns, config, params, data_marked, "sum", ravel, amortize=True
    )(v)
    np.testing.assert_allclose(
        np.asarray(mv_plain), np.asarray(mv_amort), atol=1e-10
    )


def test_acc_mvp_invalid_reduction_raises_on_amortized_path():
    """The amortized branch used to return before validation, silently
    treating a typo'd reduction as 'sum'."""
    import pytest

    from pytorchhessianfree_tpu import HFConfig, HFModelFns, TrainableRavel
    from pytorchhessianfree_tpu.accumulate import make_acc_mvp

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5)
    ravel = TrainableRavel(params)
    xs = jax.random.normal(key, (2, 8, 7), jnp.float64)
    ys = jax.random.normal(key, (2, 8, 3), jnp.float64)

    with pytest.raises(ValueError, match="reduction"):
        make_acc_mvp(
            fns, config, params, (xs, ys), "meen", ravel, amortize=True
        )


def test_chunks_pytree_inputs():
    """Stacked datalists with pytree INPUTS (dict-of-arrays features) work
    through _chunks / concat_datalist (xs used to be indexed directly)."""
    from pytorchhessianfree_tpu.accumulate import (
        StackedData,
        concat_datalist,
    )

    xs = {"a": jnp.arange(12.0).reshape(2, 3, 2), "b": jnp.ones((2, 3))}
    ys = jnp.arange(6.0).reshape(2, 3)
    cat_x, cat_y = concat_datalist(StackedData(xs, ys))
    assert cat_x["a"].shape == (6, 2)
    assert cat_x["b"].shape == (6,)
    assert cat_y.shape == (6,)
    np.testing.assert_array_equal(
        np.asarray(cat_x["a"]), np.asarray(xs["a"].reshape(6, 2))
    )
