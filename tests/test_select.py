"""Tests for CG-backtracking and the Armijo line search.

Pins the reference's early-stopping semantics exactly via its toy example
(reference tests/test_cg_backtracking.py:8-44: exhaustive variant returns the
global argmin index 1, efficient variant stops early and returns index 4) and
checks the line search against a straightforward host-side replay of the
reference algorithm (reference linesearch.py:8-103).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import (
    cg_backtracking,
    cg_efficient_backtracking,
    simple_linesearch,
)
from pytorchhessianfree_tpu.ops.cg import CGResult


STORAGES = ["rows", "flat1d", "chunked"]


def _toy_cgres(storage="rows"):
    """The reference toy steps_list [2.0, 1.0, None, 2.7, 2.4, None, None, 7.3]
    re-expressed as a CGResult: grid slots hold the stored iterations, the
    ``None`` holes are simply absent grid entries, the final iterate (7.3)
    lives at iteration num_iters = 7.

    ``storage`` selects which buffer form the walk reads through -- the
    legacy 2-D ``x_buf`` rows, the 1-D flat buffer, or the chunked 2-D flat
    buffer (n=2, values duplicated per row) -- so the reference-parity
    semantics are pinned on the production ``row()`` paths, not just the
    fallback (r4 review finding)."""
    stored_iters = (0, 1, 3, 4)
    vals = [2.0, 1.0, 2.7, 2.4]
    if storage == "chunked":
        x_buf = jnp.asarray([[v, v] for v in vals])
        x = jnp.asarray([7.3, 7.3])
        # n=2 -> chunk gcd(2, 1024) = 2: flat storage is [rows*n//2, 2]
        x_buf_flat = x_buf
    else:
        x_buf = jnp.asarray([[v] for v in vals])
        x = jnp.asarray([7.3])
        x_buf_flat = x_buf.reshape(-1) if storage == "flat1d" else None
    return CGResult(
        x=x,
        num_iters=jnp.asarray(7, jnp.int32),
        reason=jnp.asarray(2, jnp.int32),
        x_buf=x_buf,
        stored_iters=stored_iters,
        m_hist=jnp.zeros(9),
        nonpos_pAp=jnp.asarray(False),
        x_buf_flat=x_buf_flat,
    )


def _tfunc(step):
    return step[0] + 10.0


@pytest.mark.parametrize("storage", STORAGES)
@pytest.mark.parametrize("mode", ["sequential", "batched"])
def test_efficient_backtracking_toy(mode, storage):
    res = cg_efficient_backtracking(
        _tfunc, _toy_cgres(storage), mode=mode
    )
    # Reverse walk: iter 7 (17.3) -> iter 4 (12.4, improves) -> iter 3
    # (12.7, no improvement -> stop).  Best observed = iteration 4.
    assert int(res.best_iter) == 4
    np.testing.assert_allclose(float(res.f_best), 12.4)
    np.testing.assert_allclose(float(res.step[0]), 2.4)


@pytest.mark.parametrize("storage", STORAGES)
def test_exhaustive_backtracking_toy(storage):
    res = cg_backtracking(_tfunc, _toy_cgres(storage))
    # Global argmin: iteration 1 (f = 11.0).
    assert int(res.best_iter) == 1
    np.testing.assert_allclose(float(res.f_best), 11.0)


@pytest.mark.parametrize("mode", ["sequential", "batched"])
def test_backtracking_dedupes_final_iterate(mode):
    """A grid slot at the final iteration must not be evaluated twice; rows
    beyond num_iters must be skipped like the reference's None holes."""
    cgres = CGResult(
        x=jnp.asarray([5.0]),
        num_iters=jnp.asarray(3, jnp.int32),
        reason=jnp.asarray(2, jnp.int32),
        x_buf=jnp.asarray([[9.0], [4.0], [5.0], [0.0]]),
        stored_iters=(0, 1, 3, 6),  # slot 3 duplicates final, slot 6 unreached
        m_hist=jnp.zeros(7),
        nonpos_pAp=jnp.asarray(False),
    )
    def f(step):
        return step[0]

    res = cg_efficient_backtracking(f, cgres, mode=mode)
    # Walk: final (5.0) -> iter 1 (4.0 improves) -> iter 0 (9.0 stops).  If
    # the duplicate slot at iteration 3 were evaluated, the walk would stop
    # there (5.0 >= 5.0) with best = final; if the unreached slot (0.0) were
    # evaluated, it would win outright -- both would change the result below.
    assert int(res.best_iter) == 1
    np.testing.assert_allclose(float(res.f_best), 4.0)


def _replay_reference_linesearch(f, grad, step, f_0, init_alpha, beta, c, max_iter):
    """Host-side replay of reference linesearch.py:61-103."""
    c_dir = c * float(np.dot(grad, step))
    alpha = init_alpha
    f_alpha = f(init_alpha * step)
    for _ in range(max_iter):
        if f_alpha <= f_0 + alpha * c_dir:
            return alpha, f_alpha
        alpha *= beta
        f_alpha = f(alpha * step)
    return 0.0, f_0


@pytest.mark.parametrize("seed", [0, 1, 42])
@pytest.mark.parametrize("mode", ["sequential", "batched"])
def test_linesearch_matches_reference_replay(seed, mode):
    """On a quadratic target the accepted alpha must equal the reference
    algorithm's choice."""
    rng = np.random.default_rng(seed)
    dim = 6
    R = rng.standard_normal((dim, dim))
    A = R @ R.T + 0.5 * np.eye(dim)
    g = rng.standard_normal(dim)

    def f_np(delta):
        return 0.5 * delta @ A @ delta + g @ delta + 3.0

    def f_jax(delta):
        Aj = jnp.asarray(A)
        gj = jnp.asarray(g)
        return 0.5 * delta @ (Aj @ delta) + gj @ delta + 3.0

    # Newton-ish step, deliberately overshooting so backtracking happens
    step = -3.0 * np.linalg.solve(A, g)
    f_0 = f_np(np.zeros(dim))

    exp_alpha, exp_f = _replay_reference_linesearch(
        f_np, g, step, f_0, init_alpha=1.0, beta=0.8, c=1e-2, max_iter=20
    )
    res = simple_linesearch(
        f_jax,
        jnp.asarray(g),
        jnp.asarray(step),
        f_0=jnp.asarray(f_0),
        init_alpha=1.0,
        mode=mode,
    )
    np.testing.assert_allclose(float(res.alpha), exp_alpha, rtol=1e-12)
    np.testing.assert_allclose(float(res.f_alpha), exp_f, rtol=1e-9)
    assert not bool(res.failed)
    assert not bool(res.not_descent)


@pytest.mark.parametrize("mode", ["sequential", "batched"])
def test_linesearch_failure_returns_zero_step(mode):
    """If no alpha satisfies Armijo (ascent direction), fall back to
    (0.0, f(0)) and flag it (reference linesearch.py:99-103)."""
    g = jnp.asarray([1.0, 1.0])
    step = jnp.asarray([1.0, 1.0])  # ascent direction

    def f(delta):
        return jnp.sum(delta) + 5.0  # strictly increasing along step

    res = simple_linesearch(
        f, g, step, f_0=jnp.asarray(5.0), init_alpha=1.0, mode=mode
    )
    assert bool(res.failed)
    assert bool(res.not_descent)
    np.testing.assert_allclose(float(res.alpha), 0.0)
    np.testing.assert_allclose(float(res.f_alpha), 5.0)


def test_linesearch_accepts_immediately():
    """A good full step is accepted at alpha = init_alpha on the first check."""
    g = jnp.asarray([2.0, 0.0])
    step = jnp.asarray([-1.0, 0.0])

    def f(delta):
        return (delta[0] + 1.0) ** 2  # min at delta = -1

    res = simple_linesearch(
        f, g, step, f_0=jnp.asarray(1.0), init_alpha=1.0
    )
    np.testing.assert_allclose(float(res.alpha), 1.0)
    np.testing.assert_allclose(float(res.f_alpha), 0.0)


def test_linesearch_validates_params():
    g = jnp.asarray([1.0])
    with pytest.raises(ValueError):
        simple_linesearch(lambda d: d[0], g, g, f_0=jnp.asarray(0.0), beta=1.5)
    with pytest.raises(ValueError):
        simple_linesearch(lambda d: d[0], g, g, f_0=jnp.asarray(0.0), c=-1.0)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    test_efficient_backtracking_toy(mode="sequential")
    test_exhaustive_backtracking_toy()
    test_linesearch_matches_reference_replay(seed=0, mode="sequential")
    print("test_select.py direct run: OK")


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("chunk", [1, 3, 7, 50])
def test_linesearch_chunked_batched_matches(seed, chunk):
    """batch_chunk-ed batched sweeps must select exactly what the full
    batched sweep (and hence the sequential loop) selects."""
    rng = np.random.default_rng(seed)
    dim = 6
    R = rng.standard_normal((dim, dim))
    A = R @ R.T + 0.5 * np.eye(dim)
    g = rng.standard_normal(dim)

    def f_jax(delta):
        Aj = jnp.asarray(A)
        gj = jnp.asarray(g)
        return 0.5 * delta @ (Aj @ delta) + gj @ delta + 3.0

    step = jnp.asarray(-3.0 * np.linalg.solve(A, g))
    f_0 = jnp.asarray(float(f_jax(jnp.zeros(dim))))

    full = simple_linesearch(
        f_jax, jnp.asarray(g), step, f_0=f_0, init_alpha=1.0, mode="batched"
    )
    chunked = simple_linesearch(
        f_jax, jnp.asarray(g), step, f_0=f_0, init_alpha=1.0,
        mode="batched", batch_chunk=chunk,
    )
    np.testing.assert_allclose(float(chunked.alpha), float(full.alpha))
    np.testing.assert_allclose(
        float(chunked.f_alpha), float(full.f_alpha), rtol=1e-12
    )
    assert bool(chunked.failed) == bool(full.failed)
