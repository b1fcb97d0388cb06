"""Randomized Nystrom low-rank preconditioner against dense oracles.

Beyond-reference capability (the reference's only preconditioner family is
the diagonal EF, reference preconditioners.py:37-127); tested in the same
dense-ground-truth style: the sketch must recover exact eigenpairs when the
rank suffices, and preconditioning the package's own CG with it must
collapse the iteration count on an ill-conditioned damped system without
changing the solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import (
    HessianFree,
    NystromSketch,
    cg,
    nystrom_sketch,
    nystrom_to_preconditioner,
)
from pytorchhessianfree_tpu.ops.spectrum import normalized_probes
from test_utils_hf import init_small_nn, small_nn_batch

F64 = jnp.float64


def _spd_decaying(dim, seed=0, decay=0.5, tail=1e-6):
    """SPD matrix with geometric spectral decay and a flat tiny tail --
    the deep-net-like shape the low-rank preconditioner targets."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    evals = np.maximum(decay ** np.arange(dim), tail)
    A = (Q * evals) @ Q.T
    return jnp.asarray(A, F64), jnp.asarray(np.sort(evals)[::-1], F64)


def _probes(r, n, seed=0):
    return normalized_probes(jax.random.PRNGKey(seed), r, n, F64)


@pytest.mark.smoke
def test_full_rank_sketch_recovers_exact_spectrum():
    dim = 16
    A, evals = _spd_decaying(dim, seed=1, decay=0.7, tail=1e-8)
    sk = nystrom_sketch(lambda v: A @ v, _probes(dim, dim, 1))
    np.testing.assert_allclose(
        np.asarray(sk.eigs), np.asarray(evals), rtol=1e-8, atol=1e-10
    )
    # U orthonormal and A_hat == A at full rank
    np.testing.assert_allclose(
        np.asarray(sk.U.T @ sk.U), np.eye(dim), atol=1e-10
    )
    A_hat = (sk.U * sk.eigs) @ sk.U.T
    np.testing.assert_allclose(np.asarray(A_hat), np.asarray(A), atol=1e-9)


def test_exact_for_lowrank_operator():
    """rank(A) = 5 < r = 8: the sketch IS the eigendecomposition."""
    dim, true_rank, r = 30, 5, 8
    rng = np.random.default_rng(3)
    B = rng.standard_normal((dim, true_rank))
    A = jnp.asarray(B @ B.T, F64)
    sk = nystrom_sketch(lambda v: A @ v, _probes(r, dim, 3))
    evals = np.linalg.eigvalsh(np.asarray(A))[::-1]
    np.testing.assert_allclose(
        np.asarray(sk.eigs[:true_rank]), evals[:true_rank], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sk.eigs[true_rank:]), 0.0, atol=1e-7 * evals[0]
    )
    A_hat = (sk.U * sk.eigs) @ sk.U.T
    np.testing.assert_allclose(np.asarray(A_hat), np.asarray(A), atol=1e-7)


def test_sketch_underestimates_psd():
    """Nystrom is a lower bound: v^T A_hat v <= v^T A v (so the
    preconditioner never over-corrects)."""
    dim, r = 24, 6
    A, _ = _spd_decaying(dim, seed=5)
    sk = nystrom_sketch(lambda v: A @ v, _probes(r, dim, 5))
    rng = np.random.default_rng(7)
    for _ in range(5):
        v = jnp.asarray(rng.standard_normal(dim), F64)
        quad_hat = float(v @ (sk.U * sk.eigs) @ (sk.U.T @ v))
        quad = float(v @ A @ v)
        assert quad_hat <= quad + 1e-9


@pytest.mark.smoke
def test_preconditioned_cg_iteration_collapse():
    """On a geometric-decay SPD system with damping mu, rank-r Nystrom
    preconditioning cuts CG iterations by >= 3x at equal solution quality
    (the Frangella-Tropp-Udell condition-number mechanism)."""
    dim, r, mu = 120, 25, 1e-3
    A, evals = _spd_decaying(dim, seed=9, decay=0.75, tail=1e-6)
    rng = np.random.default_rng(11)
    x_true = jnp.asarray(rng.standard_normal(dim), F64)
    Ad = lambda v: A @ v + mu * v
    b = Ad(x_true)

    plain = cg(Ad, b, tol=1e-10, max_iter=dim)
    sk = nystrom_sketch(lambda v: A @ v, _probes(r, dim, 9))
    M = nystrom_to_preconditioner(sk, mu)
    pre = cg(Ad, b, M=M, tol=1e-10, max_iter=dim)

    # solution quality: the residual meets the tolerance, and the error is
    # bounded by ||(A + mu)^{-1}|| * ||r|| (the damped system's conditioning
    # -- NOT a defect of the preconditioner, which only changes the rate)
    res_norm = float(jnp.linalg.norm(Ad(pre.x) - b))
    assert res_norm <= 1e-9 * float(jnp.linalg.norm(b))
    np.testing.assert_allclose(
        np.asarray(pre.x), np.asarray(x_true), rtol=1e-4, atol=1e-5
    )
    assert int(pre.num_iters) * 3 <= int(plain.num_iters), (
        int(pre.num_iters), int(plain.num_iters),
    )


def test_full_rank_preconditioner_is_exact_inverse():
    """r = n: P^{-1}(A + mu I) = (eigs_min + mu) * I, so CG converges in
    one iteration."""
    dim, mu = 12, 1e-2
    A, _ = _spd_decaying(dim, seed=13, decay=0.6, tail=1e-5)
    sk = nystrom_sketch(lambda v: A @ v, _probes(dim, dim, 13))
    M = nystrom_to_preconditioner(sk, mu)
    Ad = lambda v: A @ v + mu * v
    rng = np.random.default_rng(17)
    v = jnp.asarray(rng.standard_normal(dim), F64)
    scale = float(sk.eigs[-1] + mu)
    np.testing.assert_allclose(
        np.asarray(M(Ad(v))), scale * np.asarray(v), rtol=1e-7
    )
    b = Ad(jnp.asarray(rng.standard_normal(dim), F64))
    res = cg(Ad, b, M=M, tol=1e-10, max_iter=dim)
    assert int(res.num_iters) <= 2


def test_preconditioner_identity_on_complement_and_spd():
    dim, r, mu = 20, 5, 0.1
    A, _ = _spd_decaying(dim, seed=19)
    sk = nystrom_sketch(lambda v: A @ v, _probes(r, dim, 19))
    M = nystrom_to_preconditioner(sk, mu)
    rng = np.random.default_rng(23)
    v = jnp.asarray(rng.standard_normal(dim), F64)
    v_perp = v - sk.U @ (sk.U.T @ v)
    np.testing.assert_allclose(
        np.asarray(M(v_perp)), np.asarray(v_perp), atol=1e-10
    )
    # SPD: v^T M v > 0 and symmetric (check via random pairs)
    w = jnp.asarray(rng.standard_normal(dim), F64)
    assert float(v @ M(v)) > 0
    np.testing.assert_allclose(float(w @ M(v)), float(v @ M(w)), rtol=1e-10)


def test_sketch_validation_errors():
    A = jnp.eye(4, dtype=F64)
    with pytest.raises(ValueError, match=r"\[r, n\]"):
        nystrom_sketch(lambda v: A @ v, jnp.ones((4,), F64))
    with pytest.raises(ValueError, match="exceeds"):
        nystrom_sketch(lambda v: A @ v, jnp.ones((5, 4), F64))


# ---------------------------------------------------------------------------
# Through the optimizer step (live damping)
# ---------------------------------------------------------------------------


def _opt_problem(seed=0):
    params, model_fn, mse = init_small_nn(seed, dtype=F64)
    x, y = small_nn_batch(seed, N=16, dtype=F64)
    return params, model_fn, mse, (x, y)


@pytest.mark.smoke
def test_wrapper_step_with_nystrom_preconditioner():
    """get_nystrom_sketch + step(precond_lowrank=...) must equal the same
    step with the explicitly built M closure at the live damping -- the
    in-step construction is just a dynamic-operand version of it."""
    params, model_fn, mse, batch = _opt_problem(4)

    opt_lr = HessianFree(params, model_fn=model_fn, loss_outer=mse)
    opt_m = HessianFree(params, model_fn=model_fn, loss_outer=mse)

    sk = opt_lr.get_nystrom_sketch(batch, rank=12)
    assert isinstance(sk, NystromSketch)
    assert sk.U.shape == (opt_lr.ravel.dim, 12)
    assert float(sk.eigs[0]) > 0 and float(sk.eigs[-1]) >= 0

    damping0 = float(opt_m.state.damping)
    M = nystrom_to_preconditioner(sk, damping0)
    loss_lr = opt_lr.step(batch, precond_lowrank=sk)
    loss_m = opt_m.step(batch, M=M)
    np.testing.assert_allclose(loss_lr, loss_m, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(opt_lr.ravel.ravel(opt_lr.params)),
        np.asarray(opt_m.ravel.ravel(opt_m.params)),
        atol=1e-12,
    )
    # and it keeps training
    l2 = opt_lr.step(batch, precond_lowrank=sk)
    assert l2 < loss_lr


def test_wrapper_nystrom_argument_validation():
    params, model_fn, mse, batch = _opt_problem(5)
    opt = HessianFree(params, model_fn=model_fn, loss_outer=mse)
    sk = opt.get_nystrom_sketch(batch, rank=4)
    diag = jnp.ones((opt.ravel.dim,), opt.ravel.dtype)
    with pytest.raises(ValueError, match="cannot be combined"):
        opt.step(batch, precond_diag=diag, precond_lowrank=sk)
    with pytest.raises(ValueError, match="cannot be combined"):
        opt.step(batch, M=lambda v: v, precond_lowrank=sk)


def test_hessian_sketch_clips_negative():
    params, model_fn, mse, batch = _opt_problem(6)
    opt = HessianFree(params, model_fn=model_fn, loss_outer=mse)
    sk = opt.get_nystrom_sketch(batch, rank=8, curvature="hessian")
    assert float(sk.eigs[-1]) >= 0.0
