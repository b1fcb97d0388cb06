"""Tests for the on-device PCG solver.

Ports the reference test strategy (reference tests/test_cg.py): residual
tolerance on random SPD systems with/without Jacobi preconditioning, the
``m_iters`` = quadratic-oracle identity, exact None == identity
preconditioner equivalence, and one-iteration convergence with M = A^{-1}.
Plus rebuild-specific checks: the static storage grid and the
reached/stored-iterate buffer semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import cg, storing_grid
from pytorchhessianfree_tpu.ops.cg import (
    REASON_MARTENS,
    REASON_MAX_ITER,
    REASON_TOLERANCES,
)
from test_utils_hf import get_linear_system

SEEDS = [0, 1, 42]
DIMS = [3, 10, 50]
TOLS = [1e-3, 1e-6]
ATOLS = [1e-3, 1e-6]
# Incrementally computed residual may drift slightly from A @ x - b
# (reference tests/test_cg.py:31).
EPS = 5e-6


def _jacobi(A):
    d_inv = 1.0 / jnp.diag(A)

    def M(x):
        return d_inv * x

    return M


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("tol", TOLS)
@pytest.mark.parametrize("atol", ATOLS)
@pytest.mark.parametrize("precondition", [True, False])
def test_cg_residuals(seed, dim, tol, atol, precondition):
    A, b, x_exact = get_linear_system(dim, seed=seed, dtype=jnp.float32)
    M = _jacobi(A) if precondition else None

    res = cg(
        lambda x: A @ x,
        b,
        M=M,
        max_iter=10 * dim,
        tol=tol,
        atol=atol,
        martens_conv_crit=False,
        store_x_at_iters=(),
    )
    res_norm = float(jnp.linalg.norm(A @ res.x - b))
    b_norm = float(jnp.linalg.norm(b))
    assert res_norm <= max(tol * b_norm, atol) + EPS, "cg did not converge."


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("x0_none", [True, False])
@pytest.mark.parametrize("precondition", [True, False])
def test_cg_m_hist(seed, dim, x0_none, precondition):
    """m_hist entries must equal the quadratic 0.5 x^T A x - b^T x evaluated
    at the stored iterates (reference tests/test_cg.py:103-156, atol 1e-7)."""
    A, b, _ = get_linear_system(dim, seed=seed, dtype=jnp.float32)
    rng = np.random.default_rng(seed + 7)
    x0 = None if x0_none else jnp.asarray(
        2 * (rng.random(dim) - 0.5), jnp.float32
    )
    M = _jacobi(A) if precondition else None

    max_iter = 10 * dim
    res = cg(
        lambda x: A @ x,
        b,
        x0=x0,
        M=M,
        max_iter=max_iter,
        tol=1e-5,
        atol=1e-6,
        martens_conv_crit=True,
        store_x_at_iters=range(max_iter + 1),  # store everything
    )

    def quadratic(x):
        return 0.5 * x @ (A @ x) - b @ x

    num = int(res.num_iters)
    # iterate 0 is the (implicit or explicit) x0 stored in buffer row 0
    for it in range(num + 1):
        x_it = res.x if it == num else res.x_buf[it]
        np.testing.assert_allclose(
            float(quadratic(x_it)), float(res.m_hist[it]), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("dim", DIMS)
def test_pcg_identity_and_inverse(seed, dim):
    """M=None must equal M=identity exactly; M=A^{-1} must converge in one
    iteration in f64 (reference tests/test_cg.py:162-224)."""
    A, b, _ = get_linear_system(dim, seed=seed, dtype=jnp.float64)
    A_inv = jnp.linalg.inv(A)

    results = {}
    for name, M in [
        ("none", None),
        ("identity", lambda x: x),
        ("A_inv", lambda x: A_inv @ x),
    ]:
        results[name] = cg(
            lambda x: A @ x,
            b,
            M=M,
            max_iter=10 * dim,
            tol=1e-5,
            atol=1e-6,
            martens_conv_crit=False,
            store_x_at_iters=range(10 * dim),
        )

    # None and identity: exact equality at every stored iterate
    assert int(results["none"].num_iters) == int(results["identity"].num_iters)
    np.testing.assert_array_equal(
        np.asarray(results["none"].x_buf), np.asarray(results["identity"].x_buf)
    )
    np.testing.assert_array_equal(
        np.asarray(results["none"].x), np.asarray(results["identity"].x)
    )

    # Perfect preconditioner: single iteration
    assert int(results["A_inv"].num_iters) <= 1


def test_storing_grid_matches_reference_formula():
    """Grid = dedup sorted ceil(1.3^j) - 1 (reference cg.py:152-170)."""
    from math import ceil, log

    for max_iter in [10, 50, 250]:
        grid = storing_grid(max_iter)
        j_max = ceil(log(max_iter + 1) / log(1.3))
        expected = sorted(
            {int(ceil(1.3**j) - 1) for j in range(j_max + 1)}
        )
        expected = [i for i in expected if i <= max_iter]
        assert list(grid) == expected
        assert grid[0] == 0  # x0 always stored on the auto grid


@pytest.mark.parametrize("seed", SEEDS)
def test_reason_codes(seed):
    A, b, _ = get_linear_system(20, seed=seed, dtype=jnp.float64)

    # max_iter = 1 forces "Number of iterations"
    res = cg(lambda x: A @ x, b, max_iter=1, tol=1e-30, atol=None,
             martens_conv_crit=False)
    assert int(res.reason) == REASON_MAX_ITER
    assert int(res.num_iters) == 1

    # generous tolerance converges
    res = cg(lambda x: A @ x, b, max_iter=400, tol=1e-8,
             martens_conv_crit=False)
    assert int(res.reason) == REASON_TOLERANCES


def test_martens_criterion_triggers():
    """On a large ill-conditioned system with loose max_iter, Martens'
    relative-progress criterion should fire before the tolerances
    (the reference notes it triggers for dim > 10 on quadratics,
    reference tests/test_optimizer.py:106-108)."""
    A, b, _ = get_linear_system(200, seed=0, dtype=jnp.float64)
    res = cg(
        lambda x: A @ x,
        b,
        max_iter=2000,
        tol=1e-14,
        martens_conv_crit=True,
    )
    assert int(res.reason) == REASON_MARTENS
    assert int(res.num_iters) < 2000


def test_reached_mask_and_final_iterate():
    A, b, _ = get_linear_system(30, seed=1, dtype=jnp.float64)
    res = cg(
        lambda x: A @ x,
        b,
        max_iter=300,
        tol=1e-6,
        martens_conv_crit=False,
        store_x_at_iters=None,  # automatic grid
    )
    num = int(res.num_iters)
    reached = np.asarray(res.reached())
    for g, it in enumerate(res.stored_iters):
        assert reached[g] == (it <= num)
        if 0 < it <= num:
            # stored iterate must not be the zero row
            assert np.linalg.norm(np.asarray(res.x_buf[g])) > 0


def test_cg_jit_and_warm_start():
    """cg must trace inside jit, and a warm start at the solution must
    terminate immediately by tolerance."""
    A, b, x_exact = get_linear_system(10, seed=2, dtype=jnp.float64)

    @jax.jit
    def solve(b, x0):
        return cg(
            lambda x: A @ x,
            b,
            x0=x0,
            max_iter=100,
            tol=1e-5,
            martens_conv_crit=True,
        )

    res_cold = solve(b, jnp.zeros_like(b))
    res_warm = solve(b, res_cold.x)
    assert int(res_warm.num_iters) <= 2


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Direct-run subset, mirroring the reference test files' __main__ blocks
    # (reference tests/test_cg.py:227-255).
    test_cg_residuals(seed=0, dim=10, tol=1e-5, atol=1e-6, precondition=True)
    test_cg_m_hist(seed=0, dim=10, x0_none=False, precondition=False)
    test_pcg_identity_and_inverse(seed=0, dim=10)
    test_martens_criterion_triggers()
    print("test_cg.py direct run: OK")


def test_store_modes_bit_identical():
    """store_mode="cond" (default, skips off-grid stores) and "scratch"
    (writes a dead scratch row) must produce bit-identical CG results AND
    bit-identical full optimizer steps (the cond's correctness claim,
    BENCH_DETAILS)."""
    import dataclasses

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_step,
    )
    from pytorchhessianfree_tpu.models.mlp import (
        init_mlp,
        mlp_apply,
        mse_loss,
    )

    # bare cg: random SPD system, automatic grid
    A, b, _ = get_linear_system(24, seed=3, dtype=jnp.float64)
    results = {}
    for mode in ("cond", "scratch"):
        results[mode] = jax.jit(
            lambda b, m=mode: cg(
                lambda v: A @ v, b, max_iter=20,
                martens_conv_crit=True, store_x_at_iters=None,
                store_mode=m,
            )
        )(b)
    np.testing.assert_array_equal(
        np.asarray(results["cond"].x), np.asarray(results["scratch"].x)
    )
    np.testing.assert_array_equal(
        np.asarray(results["cond"].x_buf),
        np.asarray(results["scratch"].x_buf),
    )
    assert int(results["cond"].num_iters) == int(
        results["scratch"].num_iters
    )

    # full HF step (backtracking reads the buffer)
    key = jax.random.PRNGKey(2)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    ravel = TrainableRavel(params)
    kx, ky = jax.random.split(key)
    batch = (
        jax.random.normal(kx, (16, 7), jnp.float64),
        jax.random.normal(ky, (16, 3), jnp.float64),
    )
    outs = {}
    for mode in ("cond", "scratch"):
        config = HFConfig(damping=0.5, cg_max_iter=30)
        config = dataclasses.replace(
            config, cg=dataclasses.replace(config.cg, store_mode=mode)
        )
        step = make_hf_step(fns, config, ravel)
        p, _, st = step(params, init_state(ravel, config), batch)
        outs[mode] = (p, st)
    for a, b2 in zip(
        jax.tree_util.tree_leaves(outs["cond"][0]),
        jax.tree_util.tree_leaves(outs["scratch"][0]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    assert int(outs["cond"][1].best_cg_iter) == int(
        outs["scratch"][1].best_cg_iter
    )


def test_flat_buffer_chunked_rows_match_2d_view():
    """With a lane-aligned dim (multiple of 1024) the flat buffer is stored
    chunked ([rows*n//1024, 1024]) so row starts never overflow int32 (the
    jc*n form wrapped at >= ~165M params x 13 grid rows); every row() read
    must reproduce the corresponding 2-D x_buf row bit-exactly."""
    A, b, _ = get_linear_system(1024, seed=5, dtype=jnp.float64)
    res = jax.jit(
        lambda b: cg(
            lambda v: A @ v, b, max_iter=30, martens_conv_crit=True
        )
    )(b)
    assert res.x_buf_flat is not None and res.x_buf_flat.ndim == 2
    assert res.x_buf_flat.shape[1] == 1024
    for j in range(res.x_buf.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(res.row(jnp.asarray(j, jnp.int32))),
            np.asarray(res.x_buf[j]),
        )


def test_flat_and_rows_buffer_layouts_bit_identical():
    """buffer_layout is a pure storage choice: 'flat' (default) and 'rows'
    must agree bit-exactly on the solution, the stored grid, and the
    iteration count -- including an odd dim (chunk 1, legacy 1-D flat) and
    an even dim (chunked 2-D flat)."""
    for dim in (24, 37, 1024):
        A, b, _ = get_linear_system(dim, seed=7, dtype=jnp.float64)
        outs = {}
        for layout in ("flat", "rows"):
            outs[layout] = jax.jit(
                lambda b, l=layout: cg(
                    lambda v: A @ v, b, max_iter=20,
                    martens_conv_crit=True, buffer_layout=l,
                )
            )(b)
        np.testing.assert_array_equal(
            np.asarray(outs["flat"].x), np.asarray(outs["rows"].x)
        )
        np.testing.assert_array_equal(
            np.asarray(outs["flat"].x_buf), np.asarray(outs["rows"].x_buf)
        )
        assert int(outs["flat"].num_iters) == int(outs["rows"].num_iters)


def test_flat_buffer_unchunkable_overflow_guard():
    """An odd (gcd 1) dim whose grid would need row offsets >= 2**31 must
    raise at trace time instead of silently wrapping the int32 index; traced
    via eval_shape so the 11 GB buffer is never allocated."""
    n = 2**28 * 13 + 1  # odd -> chunk 1; 13 grid rows x n >> 2**31
    spec = jax.ShapeDtypeStruct((n,), jnp.float32)
    with pytest.raises(ValueError, match="overflows"):
        jax.eval_shape(
            lambda b: cg(lambda v: v, b, max_iter=50), spec
        )


def test_flat_buffer_intermediate_chunk_overflow_guard():
    """The guard must fire for INTERMEDIATE chunks too, not only chunk 1:
    at chunk=2 (even dim, not a multiple of 4) the leading buffer dim
    rows * (n // 2) still wraps int32 once rows * n >= 2**32 (~330M params
    at the 13-row cg50 grid).  Traced via eval_shape (no allocation)."""
    n = 2 * (2**27 * 13 + 1)  # gcd(n, 1024) == 2
    from math import gcd

    assert gcd(n, 1024) == 2
    spec = jax.ShapeDtypeStruct((n,), jnp.float32)
    with pytest.raises(ValueError, match="overflows"):
        # store_x_at_iters=None -> the automatic ~13-row cg50 grid, so
        # rows * (n // 2) >= 2**31 even though n // 2 alone is not
        jax.eval_shape(
            lambda b: cg(lambda v: v, b, max_iter=50,
                         store_x_at_iters=None), spec
        )


def test_flat_buffer_full_chunk_large_dim_ok():
    """The lane-aligned 1024-chunk layout stays WELL inside int32 at the
    same scale the chunk=2 guard rejects -- padding to 1024 is the
    documented fix, so it must actually trace."""
    n = 2**28 * 13 + 1024 - (2**28 * 13) % 1024  # multiple of 1024, ~3.5G
    assert n % 1024 == 0
    spec = jax.ShapeDtypeStruct((n,), jnp.float32)
    out = jax.eval_shape(
        lambda b: cg(lambda v: v, b, max_iter=50, store_x_at_iters=None),
        spec,
    )
    assert out.x.shape == (n,)
