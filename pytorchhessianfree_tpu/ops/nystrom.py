"""Randomized Nystrom low-rank preconditioner for the damped CG solve.

Beyond-reference capability: the reference's only preconditioner family is
the diagonal empirical Fisher (reference preconditioners.py:37-127, exposed
through the same ``M_func`` contract this module targets, reference
optimizer.py:126-133).  Deep-net curvature spectra decay fast with a handful
of dominant outliers (the structure :mod:`.spectrum`'s SLQ makes visible);
a diagonal cannot capture those directions, but a low-rank eigensketch can
-- and preconditioning CG with it collapses precisely the eigendirections
that dominate the iteration count.

Method (randomized Nystrom approximation + PCG preconditioner; public
references: Tropp, Yurtsever, Udell & Cevher 2017 for the stabilized
Nystrom sketch; Frangella, Tropp & Udell 2021, "Randomized Nystrom
Preconditioning", for the (A + mu I) preconditioner and its condition-number
analysis):

1. sketch ``Y = A @ Q`` for an orthonormalized probe block ``Q [n, r]``
   (``r`` curvature matvecs, batched through one ``vmap`` so the model's
   linearized matvec batches on the MXU -- the same amortized closure CG
   consumes);
2. shift by ``nu ~ eps * ||Y||_F`` for definiteness, clipped inverse-sqrt
   of the ``[r, r]`` core (eigh -- tolerates indefinite Hessians by
   keeping the PSD part), thin SVD -> eigenpairs ``(U [n, r], eigs [r])``
   of the Nystrom approximation ``A_hat ⪯ A``;
3. the damped-system preconditioner *application* (what CG's ``M(r)``
   contract wants -- an approximation of ``(A + mu I)^{-1}``):

   ``P^{-1} v = (eigs_r + mu) * U ((eigs + mu)^{-1} (U^T v)) + (v - U U^T v)``

   i.e. the captured eigendirections are rescaled to the level of the
   smallest captured eigenvalue ``eigs_r``; the orthogonal complement is
   left alone.  ``P^{-1} (A + mu I)`` then has condition number about
   ``(eigs_r + mu) / mu`` when the residual spectrum is below ``eigs_r``
   (Frangella et al., Prop. 5.3) -- independent of the top of the spectrum.

Cost: ``r`` matvecs once per sketch (amortizable across steps -- curvature
changes slowly), and two ``[n, r]`` matmuls per CG iteration.  All of it is
jit-traceable with static shapes; on the lane-padded flat space
(:class:`~pytorchhessianfree_tpu.TrainableRavel`) probes from
:func:`~pytorchhessianfree_tpu.ops.spectrum.normalized_probes` with
``pad_to=ravel.dim`` keep the padding tail in the identity branch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NystromSketch(NamedTuple):
    """Rank-``r`` eigensketch ``A_hat = U diag(eigs) U^T`` of a PSD operator.

    ``U [n, r]`` orthonormal columns, ``eigs [r]`` DESCENDING and >= 0.
    A plain pytree: pass it through jit boundaries as a dynamic operand
    (the step builders do -- one compiled program for any sketch of the
    same rank).
    """

    U: jax.Array
    eigs: jax.Array

    @property
    def rank(self) -> int:
        return self.U.shape[1]


def nystrom_sketch(
    mvp: Callable[[jax.Array], jax.Array],
    probes: jax.Array,
) -> NystromSketch:
    """Randomized Nystrom eigensketch of a PSD matvec.

    Args:
        mvp: PSD matrix-vector product on flat ``[n]`` vectors (e.g. the
            GGN closure the optimizer builds; the *undamped* operator --
            damping enters in :func:`nystrom_to_preconditioner`).
        probes: ``[r, n]`` probe rows (any full-row-rank block; Rademacher
            rows from :func:`..spectrum.normalized_probes` or Gaussian).
            Orthonormalized internally.

    Returns:
        :class:`NystromSketch` with eigenvalues clipped to ``>= 0`` and
        sorted descending.  The sketch is the exact eigendecomposition
        (up to the stabilization shift) whenever ``rank(A) <= r``.
    """
    if probes.ndim != 2:
        raise ValueError(f"probes must be [r, n], got shape {probes.shape}")
    r, n = probes.shape
    if r > n:
        raise ValueError(f"rank r={r} exceeds dimension n={n}")
    Q, _ = jnp.linalg.qr(probes.T)  # [n, r], orthonormal columns
    Y = jax.vmap(mvp)(Q.T).T  # [n, r] = A @ Q, batched matvecs
    eps = jnp.finfo(Y.dtype).eps
    # Stabilization shift (Tropp et al. 2017, fixed-rank PSD approximation):
    # makes the core Cholesky-positive even when A is singular on range(Q).
    nu = jnp.sqrt(jnp.asarray(n, Y.dtype)) * eps * jnp.linalg.norm(Y)
    Y_nu = Y + nu * Q
    core = Q.T @ Y_nu
    core = (core + core.T) / 2.0
    # Clipped inverse square root of the [r, r] core (instead of the usual
    # Cholesky): B B^T = Y_nu core^+ Y_nu^T restricted to the core's
    # positive eigenspace, so an INDEFINITE mvp (the Hessian path) yields
    # the PSD part of the approximation instead of Cholesky NaNs.
    d, W = jnp.linalg.eigh(core)
    floor = eps * jnp.maximum(jnp.max(jnp.abs(d)), eps)
    keep = d > floor
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, d, 1.0)), 0.0)
    B = Y_nu @ (W * inv_sqrt)  # [n, r]
    U, s, _ = jnp.linalg.svd(B, full_matrices=False)
    eigs = jnp.maximum(s * s - nu, 0.0)
    return NystromSketch(U=U, eigs=eigs)


def nystrom_to_preconditioner(
    sketch: NystromSketch, damping
) -> Callable[[jax.Array], jax.Array]:
    """Turn a sketch into the damped-system preconditioner application
    ``M(v) ~= (A + damping I)^{-1} v`` (Frangella et al. 2021, eq. 5.2) --
    the same ``M_func`` contract as the reference's diagonal preconditioner
    (reference preconditioners.py:108-127) and this package's
    :func:`..precond.diag_to_preconditioner`:

        P^{-1} v = (eigs_r + mu) * U ((eigs + mu)^{-1} (U^T v))
                   + (v - U (U^T v))

    SPD for any ``damping > 0``; acts as the identity on the orthogonal
    complement of the sketch (including the lane-padding null space).
    """
    U, eigs = sketch.U, sketch.eigs
    lam_r = eigs[-1]

    def M_func(v: jax.Array) -> jax.Array:
        Utv = U.T @ v
        low = U @ ((lam_r + damping) / (eigs + damping) * Utv)
        return low + (v - U @ Utv)

    return M_func


def lowrank_arg(precond_lowrank, ravel):
    """Normalize an optional :class:`NystromSketch` for the jitted-step
    calling convention (the low-rank analog of ``optimizer.precond_arg``):
    ``None`` becomes a dummy rank-1 sketch plus a static ``False`` flag."""
    if precond_lowrank is None:
        dummy = NystromSketch(
            U=jnp.zeros((1, 1), ravel.dtype), eigs=jnp.zeros((1,), ravel.dtype)
        )
        return dummy, False
    return precond_lowrank, True
