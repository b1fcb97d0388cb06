"""Diagonal empirical-Fisher preconditioner for CG.

TPU-native rebuild of reference ``hessianfree/preconditioners.py``.  The
reference offers two routes to the diagonal of the empirical Fisher
``sum_i g_i^2``: BackPACK's ``SumGradSquared`` extension
(reference preconditioners.py:11-60) and a per-sample autograd loop
(reference preconditioners.py:63-105).  Neither library nor loop is needed in
JAX: per-sample gradients are one ``jax.vmap(jax.grad(...))`` -- a single
batched forward/backward that XLA maps straight onto the MXU.  A scan-based
variant is provided for memory-constrained cases (it recomputes per sample,
like the reference's autograd loop).

Scaling parity: for ``reduction == "mean"`` the result is
``(1/N) * sum_i g_i^2`` where ``g_i`` is the gradient of the *per-sample*
loss (reference preconditioners.py:17-20, :56-58, :100-103); for ``"sum"``
it is the plain sum.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.flatten import TrainableRavel


def _per_sample_grad_fn(
    model_fn: Callable[[Any, Any], Any],
    loss_outer: Callable[[Any, Any], jax.Array],
    ravel: TrainableRavel,
):
    """Gradient of the single-sample loss, as a flat vector.

    The sample is fed through the batched ``model_fn`` with a singleton batch
    dimension, mirroring the reference's per-sample loop which applies the
    batch loss function to one sample (reference preconditioners.py:95-98);
    with ``N = 1`` the "mean" and "sum" reductions coincide, so the same
    function serves both.  The params-dependent regularizer is handled by
    the CALLERS (one shared reg gradient broadcast into every row -- the
    reference ``diag_EF_autograd`` semantics, preconditioners.py:22-24,
    at a fraction of the cost of differentiating it per sample).

    Inputs and targets may be pytrees (e.g. the ``(targets, weights)``
    layout of :func:`~pytorchhessianfree_tpu.accumulate.weighted_fns`);
    every leaf gets the singleton batch dimension.
    """

    def one_sample_loss(params, x, y):
        add_batch = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
        outputs = model_fn(params, add_batch(x))
        return loss_outer(outputs, add_batch(y))

    def one_sample_grad(params, x, y):
        return ravel.ravel(jax.grad(one_sample_loss)(params, x, y))

    return one_sample_grad


def diag_EF(
    model_fn: Callable[[Any, Any], Any],
    loss_outer: Callable[[Any, Any], jax.Array],
    params: Any,
    inputs: jax.Array,
    targets: jax.Array,
    reduction: str,
    ravel: TrainableRavel,
    loss_reg: Optional[Callable[[Any], jax.Array]] = None,
) -> jax.Array:
    """Diagonal of the empirical Fisher via ``vmap(grad)`` -- the fast path.

    Functional replacement for ``diag_EF_backpack``
    (reference preconditioners.py:11-60); with ``loss_reg`` it follows the
    reference's *autograd* variant, the one documented to support
    L2-regularized losses (reference preconditioners.py:22-24): the shared
    reg gradient is added to every per-sample gradient before squaring.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"reduction {reduction} is not supported.")
    one_sample_grad = _per_sample_grad_fn(model_fn, loss_outer, ravel)
    grads = jax.vmap(one_sample_grad, in_axes=(None, 0, 0))(
        params, inputs, targets
    )  # [N, dim]
    if loss_reg is not None:
        # one reg gradient, broadcast into all N rows (cheaper than
        # differentiating the reg term per sample)
        grads = grads + ravel.ravel(jax.grad(loss_reg)(params))[None, :]
    diag = jnp.sum(grads**2, axis=0)
    if reduction == "mean":
        n = jax.tree_util.tree_leaves(inputs)[0].shape[0]
        diag = diag / n
    return diag


def diag_EF_scan(
    model_fn: Callable[[Any, Any], Any],
    loss_outer: Callable[[Any, Any], jax.Array],
    params: Any,
    inputs: jax.Array,
    targets: jax.Array,
    reduction: str,
    ravel: TrainableRavel,
    loss_reg: Optional[Callable[[Any], jax.Array]] = None,
) -> jax.Array:
    """Memory-lean diagonal empirical Fisher via ``lax.scan`` over samples.

    O(dim) memory instead of the ``[N, dim]`` buffer of :func:`diag_EF`;
    analog of the reference's sequential autograd loop
    (reference preconditioners.py:63-105).
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"reduction {reduction} is not supported.")
    one_sample_grad = _per_sample_grad_fn(model_fn, loss_outer, ravel)
    reg_grad = (
        ravel.ravel(jax.grad(loss_reg)(params))
        if loss_reg is not None
        else None
    )

    def body(acc, xy):
        x, y = xy
        g = one_sample_grad(params, x, y)
        if reg_grad is not None:
            g = g + reg_grad
        return acc + g**2, None

    diag, _ = jax.lax.scan(body, ravel.zeros(), (inputs, targets))
    if reduction == "mean":
        n = jax.tree_util.tree_leaves(inputs)[0].shape[0]
        diag = diag / n
    return diag


def diag_to_preconditioner(
    diag_vec: jax.Array, damping, exponent: float = 0.75
) -> Callable[[jax.Array], jax.Array]:
    """Turn a diagonal into Martens' ``(D + damping * I)^(-exponent)``
    preconditioner matvec (reference preconditioners.py:108-127)."""

    def M_func(x):
        return (diag_vec + damping) ** (-exponent) * x

    return M_func


class EMADiag:
    """Exponential moving average of per-batch preconditioner diagonals.

    Smooths the empirical-Fisher diagonal across steps (per-batch diagonals
    are noisy at small batch sizes); a capability beyond the reference's
    per-batch construction.  Host-side convenience -- hand ``update(diag)``'s
    return value to the step as ``precond_diag``:

        ema = EMADiag(decay=0.9)
        for batch in batches:
            diag = opt.get_preconditioner(*batch, reduction="mean")
            opt.step(batch, precond_diag=ema.update(diag))
    """

    def __init__(self, decay: float = 0.9):
        if not 0.0 <= decay < 1.0:
            raise ValueError(f"Invalid decay {decay}")
        self.decay = decay
        self.diag: Optional[jax.Array] = None

    def update(self, diag: jax.Array) -> jax.Array:
        if self.diag is None:
            self.diag = diag
        else:
            self.diag = self.decay * self.diag + (1.0 - self.decay) * diag
        return self.diag


def diag_EF_preconditioner(
    model_fn: Callable[[Any, Any], Any],
    loss_outer: Callable[[Any, Any], jax.Array],
    params: Any,
    inputs: jax.Array,
    targets: jax.Array,
    reduction: str,
    damping,
    exponent: Optional[float] = None,
    ravel: Optional[TrainableRavel] = None,
    use_scan: bool = False,
    loss_reg: Optional[Callable[[Any], jax.Array]] = None,
) -> Tuple[Callable[[jax.Array], jax.Array], jax.Array]:
    """Compose the empirical-Fisher diagonal with the preconditioner closure
    (reference preconditioners.py:130-159).

    Returns ``(M_func, diag)`` -- unlike the reference's method wrapper
    ``HessianFree.get_preconditioner``, which forgets its ``return`` statement
    and always yields ``None`` (reference optimizer.py:943-952, a bug this
    rebuild deliberately fixes), the diagonal is returned too so callers can
    pass it into a jitted step as a dynamic operand.
    """
    if ravel is None:
        ravel = TrainableRavel(params)
    fn = diag_EF_scan if use_scan else diag_EF
    diag = fn(
        model_fn, loss_outer, params, inputs, targets, reduction, ravel,
        loss_reg=loss_reg,
    )
    if exponent is None:
        M_func = diag_to_preconditioner(diag, damping)
    else:
        M_func = diag_to_preconditioner(diag, damping, exponent)
    return M_func, diag
