"""Curvature-spectrum diagnostics: Lanczos Ritz values + stochastic Lanczos
quadrature (SLQ).

Beyond-reference capability (the reference exposes no spectral tooling --
SURVEY.md §2.3): matrix-free spectral diagnostics of the *same* flat
curvature operators the CG solver consumes (``ops.curvature`` HVP/GGN-VP
through ``TrainableRavel``).  Answers the questions Hessian-free users
actually ask of the quadratic model:

- ``lambda_max`` / top-k Ritz values -- how stiff is the curvature, is the
  initial damping (reference optimizer.py:95: ``damping=1.0``) in the right
  decade, is CG's iteration budget plausible for the condition number?
- negative Ritz values on the Hessian path -- saddle-point diagnostics
  complementing the solver's ``nonpos_curvature`` flag.
- SLQ spectral density / trace estimates -- bulk-vs-outlier structure of
  the GGN without ever materializing it.

Everything is shape-static and jit-traceable: ``lanczos`` is one
``lax.scan`` whose body is dominated by the curvature matvec (MXU work),
full reorthogonalization is two ``[k, n] x [n]`` matmuls against the stored
basis (zero rows for not-yet-filled slots contribute nothing, so no dynamic
shapes), and SLQ ``vmap``s whole Lanczos runs over the probe axis so the
model's matvec batches across probes.

References (methods, public): Lanczos with full reorthogonalization (Paige
1971; Golub & Van Loan ch. 10), stochastic Lanczos quadrature for spectral
densities and trace estimation (Ubaru, Chen & Saad 2017; Ghorbani, Krishnan
& Xiao 2019 apply it to deep-net Hessians).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

MatVec = Callable[[jax.Array], jax.Array]


class LanczosResult(NamedTuple):
    """Tridiagonalization ``T = V A V^T`` of a symmetric operator.

    ``alpha[j] = v_j^T A v_j`` is the diagonal of ``T``; ``beta[j]`` couples
    ``v_j`` and ``v_{j+1}`` (so ``T`` uses ``beta[:-1]`` and ``beta[-1]`` is
    the residual norm that enters the Kaniel-Paige error bound).  On exact
    breakdown (an invariant Krylov subspace -- ``beta_j`` below the
    tolerance) the remaining entries are zero: ``T`` decouples and the
    trailing block contributes spurious *zero* eigenvalues whose first-
    component weights are exactly zero, so :func:`tridiag_ritz` and SLQ
    weights identify them.

    ``basis`` is the ``[k, n]`` row-stack of Lanczos vectors when requested
    (needed to map Ritz vectors back to parameter space), else ``None``.
    """

    alpha: jax.Array
    beta: jax.Array
    basis: Optional[jax.Array]


def lanczos(
    mvp: MatVec,
    v0: jax.Array,
    num_iters: int,
    *,
    reorth: bool = True,
    keep_basis: bool = False,
    breakdown_tol: float = 1e-8,
) -> LanczosResult:
    """Run ``num_iters`` Lanczos iterations of a symmetric ``mvp``.

    Args:
        mvp: Symmetric matrix-vector product on flat vectors (a curvature
            closure from the optimizer layer, or any linear map).
        v0: Start vector (normalized internally; must be nonzero).
        num_iters: Krylov dimension ``k`` (static -- fixed scan length).
        reorth: Full reorthogonalization against every stored basis vector
            (twice -- classical Gram-Schmidt applied twice is numerically
            equivalent to modified GS but runs as two dense ``[k,n]``
            matmuls instead of ``k`` dependent AXPYs).  Essential in f32
            for eigenvalue work; SLQ density estimates conventionally run
            without it.
        keep_basis: Return the ``[k, n]`` basis (implied by ``reorth``).
        breakdown_tol: ``beta`` below this is treated as exact breakdown.

    The scan carries the basis buffer at full ``[k, n]`` size with static
    shapes; memory is ``k * n`` elements, so keep ``k`` modest (tens to a
    few hundred) for large models.
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    v0 = v0 / jnp.linalg.norm(v0)
    n = v0.shape[0]
    store = reorth or keep_basis
    V0 = jnp.zeros((num_iters, n), v0.dtype) if store else None

    def body(carry, j):
        V, v_prev, v_cur, beta_prev = carry
        if store:
            V = lax.dynamic_update_slice(V, v_cur[None, :], (j, 0))
        w = mvp(v_cur)
        alpha_j = jnp.vdot(v_cur, w)
        w = w - alpha_j * v_cur - beta_prev * v_prev
        if reorth:
            # Unfilled rows of V are zero: projecting against them is a
            # no-op, so the shapes stay static for any iteration count.
            for _ in range(2):
                w = w - (V @ w) @ V
        beta_j = jnp.linalg.norm(w)
        ok = beta_j > breakdown_tol
        v_next = jnp.where(ok, w / jnp.where(ok, beta_j, 1.0), 0.0)
        beta_j = jnp.where(ok, beta_j, 0.0)
        return (V, v_cur, v_next, beta_j), (alpha_j, beta_j)

    init = (V0, jnp.zeros_like(v0), v0, jnp.asarray(0.0, v0.dtype))
    (V, _, _, _), (alphas, betas) = lax.scan(
        body, init, jnp.arange(num_iters)
    )
    return LanczosResult(alphas, betas, V if keep_basis else None)


def tridiag_eigh(
    alpha: jax.Array, beta: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of the (small, dense) Lanczos tridiagonal.

    ``alpha`` is the ``[k]`` diagonal; ``beta``'s first ``k-1`` entries are
    the subdiagonal (``beta[-1]`` is the residual coupling, not part of
    ``T``).  Returns ``(theta, Y)`` ascending, as :func:`jnp.linalg.eigh`.
    """
    off = beta[:-1]
    T = jnp.diag(alpha) + jnp.diag(off, 1) + jnp.diag(off, -1)
    return jnp.linalg.eigh(T)


class RitzResult(NamedTuple):
    """Ritz approximations to the operator's eigenvalues, DESCENDING.

    ``residual_bounds[i] = |beta_k * Y[k-1, i]|`` bounds the distance from
    ``values[i]`` to some true eigenvalue (Kaniel-Paige); ``weights[i] =
    Y[0, i]^2`` is the start-vector overlap -- exactly zero for the
    spurious zeros a Lanczos breakdown appends, so genuine Ritz pairs are
    the ones with positive weight.
    """

    values: jax.Array
    residual_bounds: jax.Array
    weights: jax.Array


def ritz(
    mvp: MatVec,
    v0: jax.Array,
    num_iters: int,
    *,
    reorth: bool = True,
    breakdown_tol: float = 1e-8,
) -> RitzResult:
    """Ritz values of ``mvp`` from one Lanczos run (extremal eigenvalues
    converge first, so modest ``num_iters`` pins ``lambda_max`` and, on the
    Hessian path, the most negative eigenvalue)."""
    res = lanczos(
        mvp, v0, num_iters, reorth=reorth, breakdown_tol=breakdown_tol
    )
    theta, Y = tridiag_eigh(res.alpha, res.beta)
    bounds = jnp.abs(res.beta[-1] * Y[-1, :])
    weights = Y[0, :] ** 2
    order = jnp.argsort(theta)[::-1]
    return RitzResult(theta[order], bounds[order], weights[order])


def slq(
    mvp: MatVec,
    probes: jax.Array,
    num_iters: int,
    *,
    reorth: bool = False,
    breakdown_tol: float = 1e-8,
) -> Tuple[jax.Array, jax.Array]:
    """Stochastic Lanczos quadrature: Gauss nodes/weights per probe.

    For each (unit-norm) probe row ``v``, the Lanczos tridiagonal's
    eigendecomposition gives a ``num_iters``-point Gauss quadrature of the
    spectral measure ``sum_i <v, u_i>^2 delta(lambda - lambda_i)``:
    nodes are the Ritz values, weights the squared first eigenvector
    components.  The quadrature is exact for polynomials up to degree
    ``2 * num_iters - 1``, which :mod:`tests.test_spectrum` pins moment by
    moment against a dense oracle.

    Probes are vmapped: one compiled program runs all Lanczos chains in
    lockstep and the model matvec batches across the probe axis.

    Returns:
        ``(nodes, weights)`` of shape ``[num_probes, num_iters]``; each
        row's weights sum to 1.
    """

    def one(v):
        res = lanczos(
            mvp, v, num_iters, reorth=reorth, breakdown_tol=breakdown_tol
        )
        theta, Y = tridiag_eigh(res.alpha, res.beta)
        return theta, Y[0, :] ** 2

    return jax.vmap(one)(probes)


def slq_trace(
    nodes: jax.Array,
    weights: jax.Array,
    dim: int,
    f: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """Hutchinson-type estimate of ``trace(f(A))`` from SLQ nodes/weights:
    ``dim * mean_probes sum_i w_i f(theta_i)`` (``f=None`` means identity,
    i.e. ``trace(A)``)."""
    vals = nodes if f is None else f(nodes)
    return dim * jnp.mean(jnp.sum(weights * vals, axis=-1))


def slq_density(
    nodes: jax.Array,
    weights: jax.Array,
    grid: jax.Array,
    sigma: float,
) -> jax.Array:
    """Gaussian-smoothed spectral density on ``grid`` (integrates to ~1):
    the average over probes of ``sum_i w_i N(grid; theta_i, sigma)``."""
    z = (grid[:, None, None] - nodes[None, :, :]) / sigma
    kern = jnp.exp(-0.5 * z * z) / (sigma * math.sqrt(2.0 * math.pi))
    return jnp.mean(jnp.sum(weights[None, :, :] * kern, axis=-1), axis=-1)


def normalized_probes(
    key: jax.Array,
    num_probes: int,
    dim: int,
    dtype=jnp.float32,
    *,
    pad_to: Optional[int] = None,
) -> jax.Array:
    """Unit-norm Rademacher probe rows ``[num_probes, dim]`` (optionally
    zero-padded to ``pad_to`` columns -- probes for a lane-aligned
    ``TrainableRavel`` space must live in the unpadded subspace, where the
    curvature operator acts; the padding tail is its null space)."""
    r = jax.random.rademacher(key, (num_probes, dim), dtype)
    r = r / jnp.linalg.norm(r, axis=1, keepdims=True)
    if pad_to is not None:
        if pad_to < dim:
            raise ValueError(f"pad_to={pad_to} < dim={dim}")
        r = jnp.pad(r, ((0, 0), (0, pad_to - dim)))
    return r
