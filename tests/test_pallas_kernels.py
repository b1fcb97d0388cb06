"""Fused CG-update kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import cg
from pytorchhessianfree_tpu.ops.pallas_kernels import (
    HAS_PALLAS,
    fused_cg_update,
    fused_cg_update_reference,
)
from test_utils_hf import get_linear_system

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")

SIZES = [128, 1024, 5000]  # includes a non-tile-aligned size


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_update_matches_reference(n, seed):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal(n), jnp.float32)
    x, r, p, Ap, b = mk(), mk(), mk(), mk(), mk()
    alpha = jnp.float32(0.37)

    xk, rk, mk_, rrk = fused_cg_update(x, r, p, Ap, b, alpha, interpret=True)
    xr, rr_, mr, rrr = fused_cg_update_reference(x, r, p, Ap, b, alpha)

    np.testing.assert_allclose(
        np.asarray(xk), np.asarray(xr), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rk), np.asarray(rr_), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(float(mk_), float(mr), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(rrk), float(rrr), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 42])
def test_cg_with_fused_kernel_converges(seed):
    """cg(use_fused_kernel=True) must solve the system like the plain path."""
    A, b, x_exact = get_linear_system(40, seed=seed, dtype=jnp.float32)

    res_fused = cg(lambda v: A @ v, b, max_iter=400, tol=1e-6,
                   martens_conv_crit=False, use_fused_kernel=True)

    # Different f32 reduction order means the iterate trajectory is not
    # bitwise-comparable to the plain path on an ill-conditioned system; the
    # contract is the converged residual (same criterion as the plain-path
    # residual test).
    r_norm = float(jnp.linalg.norm(A @ res_fused.x - b))
    assert r_norm <= 1e-6 * float(jnp.linalg.norm(b)) + 5e-5
