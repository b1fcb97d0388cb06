"""Params-dependent (L2) loss terms through the split model form.

The reference's flagship workload is L2-regularized All-CNN-C: the user's
``forward`` closure returns the regularized loss while the GGN flows through
the outputs (reference examples/example_utils.py:76-81,
run_allcnnc_cifar100_deepobs.py:23-31), and ``diag_EF_autograd`` supports
regularized losses (reference preconditioners.py:22-24).  These tests pin
the rebuild's ``HFModelFns.loss_reg`` semantics:

- gradient, init/final losses, LM rho, backtracking and line search all see
  the regularized objective;
- GGN curvature excludes the reg term (zero curvature through outputs);
- Hessian curvature includes the reg Hessian;
- acc_step applies the reg exactly once (not per chunk);
- diag-EF adds the shared reg gradient to every per-sample gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    hf_acc_step,
    hf_step,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models.mlp import init_mlp, mlp_apply, mse_loss

COEFF = 1e-2


def l2_all(params):
    return 0.5 * COEFF * sum(
        jnp.sum(p**2) for p in jax.tree_util.tree_leaves(params)
    )


def _problem(seed, N=16):
    key = jax.random.PRNGKey(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, dtype=jnp.float64)
    x = jax.random.normal(kx, (N, 7), jnp.float64)
    y = jax.random.normal(ky, (N, 3), jnp.float64)
    return params, x, y


@pytest.mark.parametrize("seed", [0, 1])
def test_loss_and_grad_include_reg_ggn_excludes(seed):
    """grad = data grad + coeff * params; GGN matvec identical with/without
    the reg term; Hessian matvec gains exactly + coeff * v."""
    from pytorchhessianfree_tpu.optimizer import _build_matvec_and_grad

    params, x, y = _problem(seed)
    ravel = TrainableRavel(params)
    batch = (x, y)
    plain = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    reg = HFModelFns(
        model_fn=mlp_apply, loss_outer=mse_loss, loss_reg=l2_all
    )

    cfg_g = HFConfig(damping=0.1)
    l0, g0, mvp0 = _build_matvec_and_grad(plain, cfg_g, ravel, params, batch)
    l1, g1, mvp1 = _build_matvec_and_grad(reg, cfg_g, ravel, params, batch)

    pvec = np.asarray(ravel.ravel(params))
    np.testing.assert_allclose(
        float(l1), float(l0) + 0.5 * COEFF * np.sum(pvec**2), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0) + COEFF * pvec, atol=1e-14
    )

    v = jax.random.normal(jax.random.PRNGKey(9), (ravel.dim,), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(mvp1(v)), np.asarray(mvp0(v)), atol=1e-14
    )  # GGN excludes reg curvature

    cfg_h = HFConfig(curvature_opt="hessian", damping=0.1)
    _, _, hvp0 = _build_matvec_and_grad(plain, cfg_h, ravel, params, batch)
    _, _, hvp1 = _build_matvec_and_grad(reg, cfg_h, ravel, params, batch)
    np.testing.assert_allclose(
        np.asarray(hvp1(v)),
        np.asarray(hvp0(v)) + COEFF * np.asarray(v),
        atol=1e-13,
    )  # Hessian includes the reg Hessian (coeff * I)


@pytest.mark.parametrize("curvature_opt", ["ggn", "hessian"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_acc_step_with_reg_matches_step(curvature_opt, reduction):
    """Regularized step == regularized acc_step on the chunked batch (the
    reference's step/acc_step equivalence, now with weight decay; the reg
    term must enter exactly once regardless of chunk count/reduction)."""
    from pytorchhessianfree_tpu.models.mlp import mse_loss_sum

    params, x, y = _problem(3)
    loss_outer = mse_loss if reduction == "mean" else mse_loss_sum
    fns = HFModelFns(
        model_fn=mlp_apply, loss_outer=loss_outer, loss_reg=l2_all
    )
    config = HFConfig(curvature_opt=curvature_opt, damping=0.5, cg_max_iter=40)
    ravel = TrainableRavel(params)

    p_a, s_a, st_a = hf_step(
        params, init_state(ravel, config), (x, y),
        fns=fns, config=config, ravel=ravel,
    )
    p_b, s_b, st_b = hf_acc_step(
        params, init_state(ravel, config),
        fns=fns, config=config, ravel=ravel,
        loss_data=[(x[:7], y[:7]), (x[7:], y[7:])],
        reduction=reduction,
    )
    np.testing.assert_allclose(
        float(st_a.init_loss), float(st_b.init_loss), rtol=1e-12
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    ):
        # chunked accumulation reorders the fp reductions; CG amplifies the
        # last-bit difference over its iterations (more for the ~16x-scaled
        # "sum" losses, measured ~1.3e-5 there vs <1e-5 for "mean"), while
        # every discrete decision stays in lockstep.  The reference pins
        # this equivalence at atol 1e-4 for f32 torch (reference
        # tests/test_optimizer_acc.py:124-175); this f64 suite holds 2-10x
        # tighter bounds, split per reduction scale.
        atol = 5e-5 if reduction == "sum" else 1e-5
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    assert int(st_a.num_cg_iters) == int(st_b.num_cg_iters)
    assert int(st_a.best_cg_iter) == int(st_b.best_cg_iter)
    np.testing.assert_allclose(float(st_a.lr), float(st_b.lr), rtol=1e-12)
    np.testing.assert_allclose(
        float(st_a.new_damping), float(st_b.new_damping), rtol=1e-12
    )


def test_diag_ef_with_reg_oracle():
    """diag-EF with loss_reg == sum_i (g_i + r)^2 (/N for mean) where r is
    the shared reg gradient -- reference diag_EF_autograd semantics with a
    regularized loss (reference preconditioners.py:22-24, :95-98)."""
    from pytorchhessianfree_tpu.ops.precond import diag_EF, diag_EF_scan

    params, x, y = _problem(1, N=8)
    ravel = TrainableRavel(params)

    def per_sample_grad(i):
        def one(p):
            return mse_loss(mlp_apply(p, x[i][None]), y[i][None])
        return np.asarray(ravel.ravel(jax.grad(one)(params)))

    r = COEFF * np.asarray(ravel.ravel(params))
    expected = sum((per_sample_grad(i) + r) ** 2 for i in range(8)) / 8

    got = diag_EF(
        mlp_apply, mse_loss, params, x, y, "mean", ravel, loss_reg=l2_all
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)
    got_scan = diag_EF_scan(
        mlp_apply, mse_loss, params, x, y, "mean", ravel, loss_reg=l2_all
    )
    np.testing.assert_allclose(np.asarray(got_scan), expected, atol=1e-12)


def test_full_step_reg_affects_selection():
    """End-to-end: with a huge reg coefficient the regularized objective must
    dominate the step-size choice (line search sees it) -- the regularized
    run must take a different, more conservative trajectory."""
    params, x, y = _problem(2)
    ravel = TrainableRavel(params)
    config = HFConfig(damping=0.1, cg_max_iter=30)

    def big_reg(p):
        return 50.0 * sum(
            jnp.sum(q**2) for q in jax.tree_util.tree_leaves(p)
        )

    plain = make_hf_step(
        HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss), config, ravel
    )
    reg = make_hf_step(
        HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss, loss_reg=big_reg),
        config, ravel,
    )
    _, _, st_p = plain(params, init_state(ravel, config), (x, y))
    _, _, st_r = reg(params, init_state(ravel, config), (x, y))

    reg0 = float(big_reg(params))
    np.testing.assert_allclose(
        float(st_r.init_loss), float(st_p.init_loss) + reg0, rtol=1e-12
    )
    # the quadratic model (built from the unregularized GGN) badly
    # over-promises under the huge reg -> the damping heuristic must react
    # differently than in the plain run
    assert float(st_r.lr) <= float(st_p.lr)
    # huge reg makes the step non-descent; the accepted loss may equal the
    # initial loss to the last ulp
    init = float(st_r.init_loss)
    assert float(st_r.final_loss) <= init + 1e-12 * abs(init)


def test_dp_step_with_reg_matches_single_device():
    """Data-parallel regularized step == single-device regularized step
    (loss_reg must survive the DP fns wrapping and enter exactly once)."""
    from pytorchhessianfree_tpu.parallel.data_parallel import (
        make_dp_hf_step_shardmap,
    )
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh

    params, x, y = _problem(4, N=16)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss, loss_reg=l2_all)
    config = HFConfig(damping=0.5, cg_max_iter=25)
    ravel = TrainableRavel(params)

    p_s, s_s, st_s = hf_step(
        params, init_state(ravel, config), (x, y),
        fns=fns, config=config, ravel=ravel,
    )
    mesh = make_mesh(8)
    dp_step = make_dp_hf_step_shardmap(fns, config, ravel, mesh)
    p_d, s_d, st_d = dp_step(params, init_state(ravel, config), (x, y))

    np.testing.assert_allclose(
        float(st_s.init_loss), float(st_d.init_loss), rtol=1e-12
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_s), jax.tree_util.tree_leaves(p_d)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
