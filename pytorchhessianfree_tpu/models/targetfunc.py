"""Analytic target functions as pseudo-models.

Analog of the reference's ``TargetFuncModel`` wrapper
(reference examples/example_utils.py:112-124, tests/test_utils.py:55-67),
which wraps an arbitrary callable + parameter tensor so deterministic
functions (quadratics, Rosenbrock) can be driven by the optimizer.  In the
functional API a "model" is just ``loss_fn(params, batch)`` with
``batch = None``, so these are plain loss functions plus init helpers.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..optimizer import HFModelFns


def target_func_fns(func: Callable[[jax.Array], jax.Array]) -> HFModelFns:
    """Wrap ``func(params_array) -> scalar`` as optimizer model fns.

    The parameter pytree is ``{"x": array}``; the batch is ignored (pass
    ``None``), mirroring how the reference's ``TargetFuncModel.eval_loss``
    ignores data entirely.
    """

    def loss_fn(params, batch):
        del batch
        return func(params["x"])

    return HFModelFns(loss_fn=loss_fn)


def rosenbrock(x: jax.Array, a: float = 1.0, b: float = 100.0) -> jax.Array:
    """The 2-D Rosenbrock function ``(a - x0)^2 + b (x1 - x0^2)^2`` with its
    global minimum at ``(a, a^2)`` (reference examples/run_rosenbrock.py:13-24
    uses the same a=1, b=100 banana function)."""
    return (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2


def rosenbrock_problem(
    init: Tuple[float, float] = (-0.5, 1.5), dtype=jnp.float32
):
    """Initial params + model fns for the Rosenbrock workload."""
    params = {"x": jnp.asarray(init, dtype)}
    return params, target_func_fns(rosenbrock)


def quadratic_problem(A: jax.Array, b: jax.Array, c, x_init: jax.Array):
    """Quadratic ``0.5 x^T A x + b^T x + c`` as an optimizer problem
    (reference tests/test_optimizer.py:122-126)."""

    def quad(x):
        return 0.5 * x @ (A @ x) + b @ x + c

    params = {"x": jnp.asarray(x_init)}
    return params, target_func_fns(quad)
