"""Spectral diagnostics (Lanczos / Ritz / SLQ) against dense oracles.

Beyond-reference capability (SURVEY.md §2.3: the reference exposes no
spectral tooling), tested in the reference's dense-ground-truth style
(reference tests/test_preconditioners.py:15-36): every matrix-free estimate
is checked against the explicitly assembled operator on a small problem.

Key oracle facts pinned here:

- full-Krylov Lanczos with reorthogonalization reproduces the *exact*
  spectrum of a dense SPD matrix;
- SLQ per-probe Gauss quadrature is exact for moments ``v^T A^m v`` up to
  degree ``2k - 1`` (Ubaru, Chen & Saad 2017, Thm. 4.1 mechanism);
- breakdown (invariant Krylov subspace) pads with spurious zero Ritz pairs
  whose quadrature weight is exactly zero;
- the lane-aligned padded flat space (``TrainableRavel`` +
  ``normalized_probes(pad_to=...)``) is transparent: padding is curvature
  null space and never leaks into the Ritz values' weighted support.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import TrainableRavel, ggnvp_fn, hvp_fn
from pytorchhessianfree_tpu.ops.spectrum import (
    lanczos,
    normalized_probes,
    ritz,
    slq,
    slq_density,
    slq_trace,
    tridiag_eigh,
)
from test_utils_hf import get_linear_system, init_small_nn, small_nn_batch

F64 = jnp.float64


def _sym(dim, seed=0, dtype=F64):
    """Random symmetric (indefinite) matrix."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((dim, dim))
    return jnp.asarray((M + M.T) / 2.0, dtype)


def _v0(dim, seed=0, dtype=F64):
    rng = np.random.default_rng(100 + seed)
    return jnp.asarray(rng.standard_normal(dim), dtype)


# ---------------------------------------------------------------------------
# Lanczos / Ritz against dense eigh
# ---------------------------------------------------------------------------


@pytest.mark.smoke
@pytest.mark.parametrize("seed", [0, 1])
def test_full_krylov_recovers_exact_spectrum(seed):
    """k = n Lanczos with reorthogonalization: Ritz values == eigenvalues."""
    dim = 12
    A = _sym(dim, seed)
    res = ritz(lambda v: A @ v, _v0(dim, seed), num_iters=dim)
    evals = jnp.linalg.eigvalsh(A)[::-1]  # descending
    np.testing.assert_allclose(
        np.asarray(res.values), np.asarray(evals), atol=1e-9
    )
    # Full Krylov => residual couplings vanish, weights sum to 1.
    assert float(jnp.max(res.residual_bounds)) < 1e-8
    np.testing.assert_allclose(float(jnp.sum(res.weights)), 1.0, atol=1e-12)


def test_extremal_ritz_converge_first():
    """Modest k pins lambda_max / lambda_min of an SPD A within the
    Kaniel-Paige residual bound."""
    dim = 60
    A, _, _ = get_linear_system(dim, seed=3, dtype=F64)
    res = ritz(lambda v: A @ v, _v0(dim, 3), num_iters=20)
    evals = jnp.linalg.eigvalsh(A)
    err_max = abs(float(res.values[0] - evals[-1]))
    err_min = abs(float(res.values[-1] - evals[0]))
    assert err_max <= float(res.residual_bounds[0]) + 1e-9
    assert err_max < 1e-6 * float(evals[-1])
    # smallest Ritz value is an upper bound on lambda_min and close to it
    assert float(res.values[-1]) >= float(evals[0]) - 1e-12
    assert err_min < 1e-2 * float(evals[-1])


def test_negative_curvature_detected():
    """On an indefinite operator the bottom Ritz value goes negative and
    approaches the true most-negative eigenvalue (saddle diagnostics
    complementing the solver's nonpos_curvature flag)."""
    dim = 40
    A = _sym(dim, seed=5)
    res = ritz(lambda v: A @ v, _v0(dim, 5), num_iters=25)
    lam_min = float(jnp.linalg.eigvalsh(A)[0])
    assert lam_min < 0.0
    assert float(res.values[-1]) < 0.0
    assert abs(float(res.values[-1]) - lam_min) < 1e-3 * abs(lam_min)


def test_lanczos_tridiagonal_similarity():
    """V A V^T == T and V V^T == I for the stored basis (full reorth)."""
    dim = 15
    k = 10
    A = _sym(dim, seed=7)
    res = lanczos(lambda v: A @ v, _v0(dim, 7), k, keep_basis=True)
    V = res.basis
    assert V.shape == (k, dim)
    np.testing.assert_allclose(
        np.asarray(V @ V.T), np.eye(k), atol=1e-10
    )
    T = np.asarray(V @ A @ V.T)
    off = np.asarray(res.beta[:-1])
    T_expect = (
        np.diag(np.asarray(res.alpha)) + np.diag(off, 1) + np.diag(off, -1)
    )
    np.testing.assert_allclose(T, T_expect, atol=1e-9)


def test_breakdown_spurious_zeros_have_zero_weight():
    """Start vector spanning a 3-dim invariant subspace: Lanczos breaks
    down at j=3; the trailing Ritz pairs are exact zeros with zero weight,
    the leading 3 reproduce the subspace eigenvalues."""
    dim = 8
    k = 6
    evals = jnp.asarray([5.0, 2.0, -1.0, 9.0, 9.5, 7.7, 3.3, 0.4], F64)
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    Q = jnp.asarray(Q, F64)
    A = (Q * evals) @ Q.T
    v0 = Q[:, 0] + 0.5 * Q[:, 1] - 0.25 * Q[:, 2]  # invariant 3-space
    res = ritz(lambda v: A @ v, v0, num_iters=k)
    w = np.asarray(res.weights)
    vals = np.asarray(res.values)
    live = w > 1e-12
    assert live.sum() == 3
    np.testing.assert_allclose(
        np.sort(vals[live]), [-1.0, 2.0, 5.0], atol=1e-9
    )
    np.testing.assert_allclose(vals[~live], 0.0, atol=1e-12)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)


# ---------------------------------------------------------------------------
# SLQ: quadrature exactness, trace, density
# ---------------------------------------------------------------------------


@pytest.mark.smoke
def test_slq_moments_exact_to_degree_2k_minus_1():
    """Per-probe Gauss quadrature: sum_i w_i theta_i^m == v^T A^m v for
    every m <= 2k - 1 (the defining property of the Lanczos quadrature)."""
    dim = 10
    k = 4
    A = _sym(dim, seed=2)
    probes = normalized_probes(jax.random.PRNGKey(0), 3, dim, F64)
    nodes, weights = slq(lambda v: A @ v, probes, num_iters=k, reorth=True)
    for p in range(probes.shape[0]):
        v = probes[p]
        Amv = v
        for m in range(2 * k):  # m = 0 .. 2k-1
            quad = float(jnp.sum(weights[p] * nodes[p] ** m))
            exact = float(v @ Amv)
            np.testing.assert_allclose(quad, exact, rtol=1e-9, atol=1e-9)
            Amv = A @ Amv


def test_slq_trace_exact_in_expectation_and_converges():
    """trace(A): m=1 quadrature is exact per probe, so the estimator equals
    dim * mean_p v_p^T A v_p; with unit-norm Rademacher probes this
    concentrates around trace(A)."""
    dim = 64
    A, _, _ = get_linear_system(dim, seed=9, dtype=F64)
    probes = normalized_probes(jax.random.PRNGKey(1), 128, dim, F64)
    nodes, weights = slq(lambda v: A @ v, probes, num_iters=8)
    est = float(slq_trace(nodes, weights, dim))
    manual = dim * float(jnp.mean(jax.vmap(lambda v: v @ A @ v)(probes)))
    np.testing.assert_allclose(est, manual, rtol=1e-9)
    tr = float(jnp.trace(A))
    assert abs(est - tr) < 0.05 * tr


def test_slq_trace_of_function():
    """trace(f(A)) for f=exp on a tiny problem, against dense eigh."""
    dim = 8
    A = _sym(dim, seed=4) * 0.3
    probes = normalized_probes(jax.random.PRNGKey(2), 64, dim, F64)
    nodes, weights = slq(lambda v: A @ v, probes, num_iters=dim, reorth=True)
    est = float(slq_trace(nodes, weights, dim, f=jnp.exp))
    exact = float(jnp.sum(jnp.exp(jnp.linalg.eigvalsh(A))))
    np.testing.assert_allclose(est, exact, rtol=0.05)


def test_slq_density_normalized_and_localized():
    """The smoothed density integrates to ~1 and puts its mass where the
    spectrum is."""
    dim = 32
    A, _, _ = get_linear_system(dim, seed=6, dtype=F64)
    evals = jnp.linalg.eigvalsh(A)
    lo, hi = float(evals[0]), float(evals[-1])
    pad = 0.2 * (hi - lo)
    grid = jnp.linspace(lo - pad, hi + pad, 400)
    probes = normalized_probes(jax.random.PRNGKey(3), 16, dim, F64)
    nodes, weights = slq(lambda v: A @ v, probes, num_iters=12)
    dens = slq_density(nodes, weights, grid, sigma=0.05 * (hi - lo))
    mass = float(jnp.trapezoid(dens, grid))
    np.testing.assert_allclose(mass, 1.0, atol=0.02)
    # no mass far outside the spectral interval (>= 6 sigma past lambda_max
    # the Gaussian kernel of even the top node has decayed below 1e-3)
    pad = 0.3 * (hi - lo)
    grid_far = jnp.linspace(hi + pad, hi + 2 * pad, 50)
    dens_far = slq_density(nodes, weights, grid_far, sigma=0.05 * (hi - lo))
    assert float(jnp.max(dens_far)) < 1e-3 * float(jnp.max(dens))


# ---------------------------------------------------------------------------
# Through the real curvature operators + padded flat space
# ---------------------------------------------------------------------------


def _flat_curvature(seed, which, pad_to_multiple=None):
    params, model_fn, mse = init_small_nn(seed, dtype=F64)
    x, y = small_nn_batch(seed, N=8, dtype=F64)
    ravel = TrainableRavel(params, pad_to_multiple=pad_to_multiple)

    def loss_of_params(p):
        return mse(model_fn(p, x), y)

    if which == "hessian":
        _, _, mvp_tree = hvp_fn(loss_of_params, params)
    else:
        _, _, _, mvp_tree = ggnvp_fn(
            lambda p: model_fn(p, x), lambda out: mse(out, y), params
        )

    def mvp(v):
        return ravel.ravel(mvp_tree(ravel.unravel(v)))

    def loss_of_vec(vec):
        return mse(model_fn(ravel.write(params, vec), x), y)

    return ravel, mvp, loss_of_vec, params, model_fn, mse, x, y


@pytest.mark.smoke
@pytest.mark.parametrize("which", ["hessian", "ggn"])
def test_ritz_matches_dense_curvature(which):
    """Top/bottom Ritz values of the live HVP/GGN-VP closures match the
    dense operator's eigenvalues on a small MLP."""
    ravel, mvp, loss_of_vec, params, model_fn, mse, x, y = _flat_curvature(
        0, which
    )
    n = ravel.dim
    if which == "hessian":
        D = jax.hessian(loss_of_vec)(ravel.ravel(params))
    else:
        v0 = ravel.ravel(params)

        def out_of_vec(vec):
            return model_fn(ravel.write(params, vec), x)

        J = jax.jacobian(out_of_vec)(v0).reshape(-1, n)
        outs = out_of_vec(v0)
        HL = jax.hessian(lambda o: mse(o.reshape(outs.shape), y))(
            outs.reshape(-1)
        )
        D = J.T @ HL @ J
    evals = jnp.linalg.eigvalsh(D)
    res = ritz(mvp, _v0(n, 1), num_iters=min(n, 40))
    np.testing.assert_allclose(
        float(res.values[0]), float(evals[-1]), rtol=1e-6, atol=1e-10
    )
    if which == "ggn":
        assert float(res.values[-1]) >= -1e-10  # PSD


def test_padded_space_is_transparent():
    """Probes padded into the lane-aligned space: the padding tail is
    curvature null space; Ritz values with positive weight match the
    unpadded run exactly."""
    ravel_u, mvp_u, *_ = _flat_curvature(2, "ggn")
    ravel_p, mvp_p, *_ = _flat_curvature(2, "ggn", pad_to_multiple=64)
    n = ravel_u.dim
    npad = ravel_p.dim
    assert npad > n and npad % 64 == 0
    probes = normalized_probes(jax.random.PRNGKey(5), 1, n, F64, pad_to=npad)
    assert probes.shape == (1, npad)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(probes[0])), 1.0, atol=1e-12
    )
    k = 12
    r_u = ritz(mvp_u, probes[0, :n], num_iters=k)
    r_p = ritz(mvp_p, probes[0], num_iters=k)
    np.testing.assert_allclose(
        np.asarray(r_p.values), np.asarray(r_u.values), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(r_p.weights), np.asarray(r_u.weights), atol=1e-8
    )


@pytest.mark.smoke
def test_wrapper_estimate_spectrum():
    """HessianFree.estimate_spectrum probes the LIVE curvature operator
    (padded wrapper space, GGN by default, Hessian via override) and its
    SLQ output feeds slq_trace against the dense trace."""
    from pytorchhessianfree_tpu import HessianFree

    params, model_fn, mse = init_small_nn(3, dtype=F64)
    x, y = small_nn_batch(3, N=8, dtype=F64)
    opt = HessianFree(params, model_fn=model_fn, loss_outer=mse)
    ravel = opt.ravel
    n = ravel.unpadded_dim
    assert ravel.dim > n  # default lane padding active

    def out_of_vec(vec):
        return model_fn(ravel.write(params, vec), x)

    v0 = ravel.ravel(params)
    J = jax.jacobian(out_of_vec)(v0)[..., :n].reshape(-1, n)
    outs = out_of_vec(v0)
    HL = jax.hessian(lambda o: mse(o.reshape(outs.shape), y))(
        outs.reshape(-1)
    )
    G = J.T @ HL @ J
    evals = jnp.linalg.eigvalsh(G)

    res, (nodes, weights) = opt.estimate_spectrum(
        (x, y), num_iters=min(n, 40), num_probes=16
    )
    np.testing.assert_allclose(
        float(res.values[0]), float(evals[-1]), rtol=1e-6, atol=1e-10
    )
    # padding null space never enters: every live Ritz value is a G
    # eigenvalue, and the GGN is PSD
    assert float(res.values[-1]) >= -1e-10
    est = float(slq_trace(nodes, weights, n))
    tr = float(jnp.trace(G))
    assert abs(est - tr) < 0.2 * tr

    # Hessian override: top eigenvalue differs from the GGN's in general
    # but must match the dense Hessian of the full loss
    def loss_of_vec(vec):
        return mse(model_fn(ravel.write(params, vec), x), y)

    H = jax.hessian(loss_of_vec)(v0)[:n, :n]
    res_h = opt.estimate_spectrum(
        (x, y), num_iters=min(n, 40), curvature="hessian"
    )
    np.testing.assert_allclose(
        float(res_h.values[0]),
        float(jnp.linalg.eigvalsh(H)[-1]),
        rtol=1e-6,
        atol=1e-10,
    )


def test_normalized_probes_shapes_and_errors():
    probes = normalized_probes(jax.random.PRNGKey(0), 4, 10, F64)
    assert probes.shape == (4, 10)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(probes, axis=1)), 1.0, atol=1e-12
    )
    # Rademacher entries: +-1/sqrt(10)
    np.testing.assert_allclose(
        np.abs(np.asarray(probes)), 1.0 / np.sqrt(10.0), atol=1e-12
    )
    with pytest.raises(ValueError, match="pad_to"):
        normalized_probes(jax.random.PRNGKey(0), 2, 10, F64, pad_to=5)


def test_spectrum_is_jittable():
    """Whole ritz pipeline traces under jit (static k), and lanczos
    validates num_iters eagerly."""
    dim = 16
    A = _sym(dim, seed=8)

    @jax.jit
    def top(v0):
        return ritz(lambda v: A @ v, v0, num_iters=dim).values[0]

    lam = float(top(_v0(dim, 8)))
    assert abs(lam - float(jnp.linalg.eigvalsh(A)[-1])) < 1e-8
    with pytest.raises(ValueError, match="num_iters"):
        lanczos(lambda v: A @ v, _v0(dim), 0)


def test_tridiag_eigh_matches_dense():
    alpha = jnp.asarray([1.0, 2.0, 3.0], F64)
    beta = jnp.asarray([0.5, 0.25, 0.9], F64)  # beta[-1] unused
    theta, Y = tridiag_eigh(alpha, beta)
    T = np.diag([1.0, 2.0, 3.0])
    T[0, 1] = T[1, 0] = 0.5
    T[1, 2] = T[2, 1] = 0.25
    ew, _ = np.linalg.eigh(T)
    np.testing.assert_allclose(np.asarray(theta), ew, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(Y @ Y.T), np.eye(3), atol=1e-12
    )
