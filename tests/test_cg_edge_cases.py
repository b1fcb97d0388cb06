"""CG edge cases: non-positive curvature handling, divergence, flags.

Pins the reference's soft-degradation behaviors (SURVEY.md aux subsystems):
non-PD directional curvature warning/options (reference cg.py:123-147),
NaN-residual divergence (reference cg.py:110-111), surfaced as on-device
flags/reason codes here."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import cg
from pytorchhessianfree_tpu.ops.cg import (
    REASON_DIVERGENCE,
    cg_reason_str,
)


def test_nonpos_curvature_flag_set():
    """An indefinite matrix must set the nonpos_pAp flag (the reference warns
    at reference cg.py:132-139)."""
    A = jnp.diag(jnp.asarray([1.0, -5.0, 2.0]))
    b = jnp.asarray([1.0, 1.0, 1.0])
    res = cg(lambda x: A @ x, b, max_iter=3, martens_conv_crit=False)
    assert bool(res.nonpos_pAp)

    # A definite system must NOT set it.
    A2 = jnp.diag(jnp.asarray([1.0, 5.0, 2.0]))
    res2 = cg(lambda x: A2 @ x, b, max_iter=30, martens_conv_crit=False)
    assert not bool(res2.nonpos_pAp)


def test_saddle_free_differs_from_ignore():
    """saddle-free takes |pAp| (reference cg.py:144-145): on an indefinite
    system the first iterate must differ in sign of the step scale."""
    A = jnp.diag(jnp.asarray([-2.0, -2.0, -2.0]))
    b = jnp.asarray([1.0, 1.0, 1.0])
    r_ign = cg(lambda x: A @ x, b, max_iter=1, martens_conv_crit=False,
               nonpos_curv_option="ignore", store_x_at_iters=(0, 1))
    r_sf = cg(lambda x: A @ x, b, max_iter=1, martens_conv_crit=False,
              nonpos_curv_option="saddle-free", store_x_at_iters=(0, 1))
    x_ign = np.asarray(r_ign.x)
    x_sf = np.asarray(r_sf.x)
    # alpha flips sign under saddle-free for pure negative curvature
    np.testing.assert_allclose(x_ign, -x_sf, rtol=1e-6)


def test_divergence_reason_on_nan():
    """A matvec producing NaN must terminate with the Divergence reason
    (reference cg.py:110-111)."""

    def bad_A(x):
        return x * jnp.nan

    b = jnp.ones(4)
    res = cg(bad_A, b, max_iter=10, martens_conv_crit=False)
    assert int(res.reason) == REASON_DIVERGENCE
    assert cg_reason_str(int(res.reason)) == "Divergence"


def test_invalid_nonpos_option():
    with pytest.raises(ValueError):
        cg(lambda x: x, jnp.ones(3), nonpos_curv_option="banana")


def test_unknown_gamma():
    from pytorchhessianfree_tpu import storing_grid

    with pytest.raises(ValueError):
        storing_grid(10, gamma=0.9)
