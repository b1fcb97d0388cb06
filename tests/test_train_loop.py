"""On-device multi-step training loop (lax.scan over HF steps)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
    make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply, mse_loss


def test_train_loop_matches_stepwise():
    """scan-of-steps must produce the same trajectory as Python-looped
    steps (same batches, same state threading)."""
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=25)
    ravel = TrainableRavel(params)

    xs = jax.random.normal(key, (4, 16, 7), jnp.float64)
    ys = jax.random.normal(key, (4, 16, 3), jnp.float64)

    loop = make_hf_train_loop(fns, config, ravel)
    p_loop, s_loop, stats = loop(params, init_state(ravel, config), (xs, ys))

    step = make_hf_step(fns, config, ravel)
    p, s = params, init_state(ravel, config)
    losses = []
    for i in range(4):
        p, s, st = step(p, s, (xs[i], ys[i]))
        losses.append(float(st.init_loss))

    np.testing.assert_allclose(
        np.asarray(stats.init_loss), np.asarray(losses), rtol=1e-9
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_loop), jax.tree_util.tree_leaves(p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)
    assert int(s_loop.step_count) == 4
    assert stats.num_cg_iters.shape == (4,)


def test_train_loop_ema_precond_matches_host_ema():
    """The on-device EMA preconditioner inside the scanned loop must match
    host-side EMADiag + per-step preconditioned steps."""
    from pytorchhessianfree_tpu import diag_EF
    from pytorchhessianfree_tpu.ops.precond import EMADiag

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=25)
    ravel = TrainableRavel(params)

    xs = jax.random.normal(key, (4, 16, 7), jnp.float64)
    ys = jax.random.normal(key, (4, 16, 3), jnp.float64)

    loop = make_hf_train_loop(fns, config, ravel, precond_ema_decay=0.9)
    p_loop, s_loop, stats, ema_state = loop(
        params, init_state(ravel, config), (xs, ys)
    )

    step = make_hf_step(fns, config, ravel)
    ema = EMADiag(decay=0.9)
    p, s = params, init_state(ravel, config)
    for i in range(4):
        d = diag_EF(mlp_apply, mse_loss, p, xs[i], ys[i], "mean", ravel)
        p, s, st = step(p, s, (xs[i], ys[i]), precond_diag=ema.update(d))
    for a, b in zip(
        jax.tree_util.tree_leaves(p_loop), jax.tree_util.tree_leaves(p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    assert int(s_loop.step_count) == 4


def test_train_loop_ema_requires_split_form():
    import pytest

    params = {"x": jnp.ones(3)}
    fns = HFModelFns(loss_fn=lambda p, b: jnp.sum(p["x"] ** 2))
    config = HFConfig(curvature_opt="hessian", damping=0.5)
    ravel = TrainableRavel(params)
    with pytest.raises(ValueError):
        make_hf_train_loop(fns, config, ravel, precond_ema_decay=0.9)
    with pytest.raises(ValueError):
        make_hf_train_loop(
            HFModelFns(model_fn=lambda p, x: x, loss_outer=lambda o, t: 0.0),
            config,
            ravel,
            precond_ema_decay=1.5,
        )


def test_train_loop_ema_seed_survives_resume():
    """Resuming the scanned loop from a checkpoint (step_count > 0) must
    seed the EMA diagonal with the first real diagonal, not blend it with
    the zero init (ADVICE r1: loop-local seeded flag, not step_count == 0)."""
    key = jax.random.PRNGKey(2)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=25)
    ravel = TrainableRavel(params)
    loop = make_hf_train_loop(fns, config, ravel, precond_ema_decay=0.9)

    xs = jax.random.normal(key, (2, 16, 7), jnp.float64)
    ys = jax.random.normal(key, (2, 16, 3), jnp.float64)

    s_fresh = init_state(ravel, config)
    s_resumed = s_fresh._replace(step_count=jnp.asarray(7, jnp.int32))
    p_a, _, stats_a, _ = loop(params, s_fresh, (xs, ys))
    p_b, _, stats_b, _ = loop(params, s_resumed, (xs, ys))

    # identical trajectories: EMA seeding must not depend on step_count
    np.testing.assert_allclose(
        np.asarray(stats_a.init_loss), np.asarray(stats_b.init_loss),
        rtol=1e-12,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_train_loop_ema_carries_across_invocations():
    """Two 2-step loop calls with the returned ema_state threaded through
    must match one 4-step call (epoch-by-epoch training does not restart
    the EMA)."""
    key = jax.random.PRNGKey(5)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=25)
    ravel = TrainableRavel(params)
    loop = make_hf_train_loop(fns, config, ravel, precond_ema_decay=0.9)

    xs = jax.random.normal(key, (4, 16, 7), jnp.float64)
    ys = jax.random.normal(key, (4, 16, 3), jnp.float64)

    p4, s4, st4, _ = loop(params, init_state(ravel, config), (xs, ys))

    p, s = params, init_state(ravel, config)
    ema_state = None
    for half in (slice(0, 2), slice(2, 4)):
        p, s, st, ema_state = loop(p, s, (xs[half], ys[half]), ema_state)

    for a, b in zip(
        jax.tree_util.tree_leaves(p4), jax.tree_util.tree_leaves(p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    assert int(s.step_count) == int(s4.step_count) == 4

    # WITHOUT threading, the second call restarts the EMA -> different
    p2, s2 = params, init_state(ravel, config)
    for half in (slice(0, 2), slice(2, 4)):
        p2, s2, _, _ = loop(p2, s2, (xs[half], ys[half]))
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(p4), jax.tree_util.tree_leaves(p2)
        )
    ]
    assert max(diffs) > 1e-12


def test_wrapper_train_steps_matches_python_loop():
    """HessianFree.train_steps (scan-of-steps on the wrapper) follows the
    exact same trajectory and history as T individual .step calls."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchhessianfree_tpu import HessianFree
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    T = 4
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, 12, 7), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(2), (T, 12, 3), jnp.float64)

    kw = dict(model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5,
              cg_max_iter=10, pad_to_multiple=None)
    opt_a = HessianFree(params, **kw)
    for i in range(T):
        opt_a.step((xs[i], ys[i]))

    opt_b = HessianFree(params, **kw)
    finals = opt_b.train_steps((xs, ys))

    assert len(finals) == T
    for k in ("init_losses", "final_losses", "dampings", "num_cg_iters",
              "best_cg_iters", "learning_rates", "cg_reasons"):
        if k in ("num_cg_iters", "best_cg_iters", "cg_reasons"):
            assert opt_a.history[k] == opt_b.history[k], k
        else:
            np.testing.assert_allclose(
                opt_a.history[k], opt_b.history[k], rtol=1e-12, atol=1e-12,
            )
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_a.params),
        jax.tree_util.tree_leaves(opt_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_wrapper_train_steps_dp_mesh_matches_single_device():
    """train_steps under a data-only mesh == the single-device trajectory."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from pytorchhessianfree_tpu import HessianFree
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    T = 3
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, 16, 7), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(2), (T, 16, 3), jnp.float64)

    kw = dict(model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5,
              cg_max_iter=10, pad_to_multiple=None)
    opt_ref = HessianFree(params, **kw)
    opt_ref.train_steps((xs, ys))

    opt_dp = HessianFree(params, **kw, mesh=make_mesh(8))
    opt_dp.train_steps((xs, ys))

    assert opt_ref.history["num_cg_iters"] == opt_dp.history["num_cg_iters"]
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_ref.params),
        jax.tree_util.tree_leaves(opt_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10)


def test_wrapper_train_steps_ema_carries_across_calls():
    """The EMA diag persists on the optimizer across train_steps calls."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchhessianfree_tpu import HessianFree
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 7), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 3), jnp.float64)

    opt = HessianFree(params, model_fn=mlp_apply, loss_outer=mse_loss,
                      damping=0.5, cg_max_iter=10, pad_to_multiple=None)
    opt.train_steps((xs, ys), precond_ema_decay=0.9)
    ema1 = np.asarray(opt._ema_state[0]).copy()
    assert bool(opt._ema_state[1])  # seeded
    opt.train_steps((xs, ys), precond_ema_decay=0.9)
    ema2 = np.asarray(opt._ema_state[0])
    assert not np.allclose(ema1, 0.0)
    assert not np.array_equal(ema1, ema2)  # kept evolving, not reset
    assert len(opt.history["init_losses"]) == 4
    assert all(np.isfinite(v) for v in opt.history["final_losses"])


def test_wrapper_train_steps_ema_keyed_by_decay():
    """Switching precond_ema_decay mid-training must NOT continue from the
    other decay's EMA diagonal: each decay owns its own persisted state,
    and returning to a previous decay resumes ITS state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchhessianfree_tpu import HessianFree
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 7), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 3), jnp.float64)

    opt = HessianFree(params, model_fn=mlp_apply, loss_outer=mse_loss,
                      damping=0.5, cg_max_iter=10, pad_to_multiple=None)
    opt.train_steps((xs, ys), precond_ema_decay=0.9)
    ema_09 = np.asarray(opt._ema_states[0.9][0]).copy()
    # a different decay starts fresh (unseeded), not from 0.9's diagonal
    opt.train_steps((xs, ys), precond_ema_decay=0.5)
    assert 0.5 in opt._ema_states and 0.9 in opt._ema_states
    np.testing.assert_array_equal(
        np.asarray(opt._ema_states[0.9][0]), ema_09
    )  # 0.9's state untouched by the 0.5 run
    # returning to 0.9 resumes its own state (it keeps evolving)
    opt.train_steps((xs, ys), precond_ema_decay=0.9)
    assert not np.array_equal(np.asarray(opt._ema_states[0.9][0]), ema_09)


def test_dp_train_loop_ema_matches_single_device():
    """make_dp_hf_train_loop with the EMA diag carry == the single-device
    EMA loop trajectory (the dryrun's n=2 fallback path, pinned in CI)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_train_loop,
    )
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss
    from pytorchhessianfree_tpu.parallel.data_parallel import (
        make_dp_hf_train_loop,
    )
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=8)
    ravel = TrainableRavel(params)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 7), jnp.float64)
    ys = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 3), jnp.float64)

    ref = make_hf_train_loop(fns, config, ravel, precond_ema_decay=0.9)
    p_ref, s_ref, st_ref, ema_ref = ref(
        params, init_state(ravel, config), (xs, ys)
    )

    dp = make_dp_hf_train_loop(
        fns, config, ravel, make_mesh(8), precond_ema_decay=0.9
    )
    p_dp, s_dp, st_dp, ema_dp = dp(
        params, init_state(ravel, config), (xs, ys)
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_dp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ema_ref[0]), np.asarray(ema_dp[0]),
        rtol=1e-9, atol=1e-12,
    )
    assert [int(v) for v in st_ref.num_cg_iters] == [
        int(v) for v in st_dp.num_cg_iters
    ]
