"""Matrix-free curvature-vector products: HVP and GGN-VP.

TPU-native replacement for the reference's BackPACK dependency
(reference optimizer.py:7-8, :450-462):

- ``backpack.hessianfree.hvp.hessian_vector_product`` (double backward on a
  retained graph) becomes forward-over-reverse ``jax.jvp(jax.grad(f), ...)``.
- ``backpack.hessianfree.ggnvp.ggn_vector_product_from_plist``
  (Gv = J^T H_L J v) becomes a ``jax.linearize`` / ``jax.vjp`` composition.

The reference amortizes one autodiff graph across all CG matvecs per batch by
computing the gradient with ``create_graph=True, retain_graph=True``
(reference optimizer.py:231-233).  The JAX analog: ``jax.linearize`` (for the
GGN) and ``jax.vjp`` residuals are built once per batch; every CG iteration
then reuses them.  The returned matvec closures are pure functions of traced
values and can be called inside ``lax.while_loop`` bodies -- the whole CG
solve stays on-device in a single XLA program.

All functions here work on parameter *pytrees*; the optimizer layer converts
to/from the flat CG vector space via :class:`TrainableRavel`.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax


def hvp_fn(
    loss_fn: Callable[[Any], jax.Array], params: Any
) -> Tuple[jax.Array, Any, Callable[[Any], Any]]:
    """Build the Hessian-vector product for ``loss_fn`` at ``params``.

    Forward-over-reverse, AMORTIZED: ``jax.linearize`` of
    ``value_and_grad(loss_fn)`` runs the nonlinear primal (forward +
    backward) ONCE per batch and stores its residuals; every subsequent
    ``hvp(v)`` call replays only the linear tangent computation.  This is
    the Hessian-path analog of the reference's retained autodiff graph --
    the gradient is computed with ``create_graph=True, retain_graph=True``
    so the same graph serves every CG matvec on that batch (reference
    optimizer.py:231-233, :450-455) -- and of this module's GGN
    linearization below.

    Returns:
        ``(loss, grad, hvp)`` where ``hvp(v)`` maps a tangent pytree ``v`` to
        ``H @ v`` as a pytree.
    """
    (loss, grad), tangent_fn = jax.linearize(
        jax.value_and_grad(loss_fn), params
    )

    def hvp(v: Any) -> Any:
        # tangent of (loss, grad) is (grad . v, H @ v); the scalar first
        # component is dead code XLA drops
        return tangent_fn(v)[1]

    return loss, grad, hvp


def ggnvp_fn(
    model_fn: Callable[[Any], Any],
    loss_outer: Callable[[Any], jax.Array],
    params: Any,
) -> Tuple[jax.Array, Any, Any, Callable[[Any], Any]]:
    """Build the GGN-vector product ``Gv = J^T H_L (J v)``.

    ``model_fn(params) -> outputs`` is linearized once (the Jacobian-vector
    product ``J v``), the Hessian of ``loss_outer`` w.r.t. the outputs is
    applied via a second forward-over-reverse, and the transpose ``J^T`` comes
    from ``jax.vjp``.  Equivalent to the reference's ``_Gv``
    (reference optimizer.py:457-462) built on BackPACK's
    ``ggn_vector_product_from_plist``.

    The duplicate forward pass implied by calling both ``jax.linearize`` and
    ``jax.vjp`` is eliminated by XLA common-subexpression elimination once the
    enclosing step is jitted.

    Returns:
        ``(loss, outputs, grad, ggnvp)`` -- ``grad`` is the full loss gradient
        d(loss_outer . model_fn)/d(params), ``ggnvp(v)`` maps a tangent pytree
        to ``G @ v``.
    """
    outputs, jvp_of_model = jax.linearize(model_fn, params)
    _, vjp_of_model = jax.vjp(model_fn, params)
    loss_grad_fn = jax.grad(loss_outer)

    loss = loss_outer(outputs)
    grad = vjp_of_model(loss_grad_fn(outputs))[0]

    def ggnvp(v: Any) -> Any:
        Jv = jvp_of_model(v)
        HJv = jax.jvp(loss_grad_fn, (outputs,), (Jv,))[1]
        return vjp_of_model(HJv)[0]

    return loss, outputs, grad, ggnvp
