"""Flax / dm-haiku model adapters (the "switching user" on-ramp).

The optimizer core is library-agnostic: ``HFModelFns`` takes plain callables
and params are any pytree, so a stateless flax module already works by
passing ``module.apply`` directly (tests/test_interop.py).  These helpers
close the remaining gap for modules that carry NON-param variable
collections (BatchNorm running statistics) or consume PRNG keys (dropout),
and for dm-haiku transforms, mapping each onto the framework's determinism
contract:

- **Non-param state is frozen during a step.**  Every evaluation inside one
  HF step -- the gradient, every CG curvature matvec, every backtracking and
  line-search trial forward -- sees the same statistics, so CG's fixed
  quadratic model assumption holds.  This is the principled version of the
  reference's "consider calling ``model.eval()``" advice for BatchNorm/
  dropout models (reference optimizer.py:406-409).  Refresh the statistics
  *between* steps with :func:`flax_state_update` / :func:`haiku_state_update`
  if train-mode tracking is wanted.
- **PRNG keys ride in the batch** (``inputs = (x, key)``), the first-class
  stochastic-model pattern (``models/mlp.py::mlp_dropout_apply``): one key
  per step means every evaluation inside the step draws the same dropout
  masks; advance the key between steps like any other batch data.  A model
  that instead rethreads a fresh key per forward is exactly what
  ``check_deterministic(fns_factory=...)`` flags.

Reference analog: the reference accepts any ``torch.nn.Module`` + loss
closure (reference optimizer.py:126-154); these adapters give flax/haiku
users the same one-liner.  Neither library is imported here -- the adapters
only call methods on the module/transform objects the caller already has, so
the package keeps its jax-only dependency surface.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax

from .optimizer import HFModelFns

__all__ = [
    "split_flax_variables",
    "flax_fns",
    "flax_state_update",
    "haiku_fns",
    "haiku_state_update",
]


def split_flax_variables(variables: Any) -> Tuple[Any, dict]:
    """Split a flax ``module.init`` result into ``(params, state)``.

    ``params`` is the trainable collection (what the optimizer sees);
    ``state`` is every other collection (``batch_stats``, ...) to pass to
    :func:`flax_fns` and refresh with :func:`flax_state_update`.
    """
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def flax_fns(
    module: Any,
    loss_outer: Optional[Callable[[Any, Any], jax.Array]] = None,
    *,
    state: Optional[dict] = None,
    state_in_batch: bool = False,
    rngs: Sequence[str] = (),
    apply_kwargs: Optional[dict] = None,
    loss_reg: Optional[Callable[[Any], jax.Array]] = None,
) -> HFModelFns:
    """Wrap a ``flax.linen.Module`` as :class:`HFModelFns` (split form).

    ``state``: non-param variable collections (from
    :func:`split_flax_variables`), closed over and FROZEN for every
    evaluation -- the module must not try to mutate them (flax raises if it
    does; run BatchNorm in inference mode, e.g. ``use_running_average=True``
    or a ``train=False`` flag via ``apply_kwargs``, and refresh the
    statistics between steps with :func:`flax_state_update`).

    ``rngs``: names of PRNG collections the module consumes (e.g.
    ``("dropout",)``).  When non-empty, batch inputs must be ``(x, key)``;
    each collection gets a key deterministically derived from the batch key
    (``fold_in`` by collection index), so the whole step sees one set of
    masks.

    ``state_in_batch``: instead of closing over a fixed ``state``, take the
    state FROM the batch -- inputs become ``(x, state)`` (or
    ``(x, key, state)`` combined with ``rngs``).  The state is still frozen
    within each step (it is batch data, and CG/backtracking/line-search all
    see one batch), but it can be refreshed between steps WITHOUT changing
    the step function's identity -- the compiled XLA program is reused,
    where swapping a new closure in would retrace and recompile.  This is
    the recompile-free route for train-mode BatchNorm tracking.  (Under the
    data-parallel builders, batch leaves are sharded on the data axis --
    replicate non-batch-shaped state leaves explicitly if you compose the
    two.)

    ``apply_kwargs``: extra keyword arguments forwarded to ``module.apply``
    (e.g. ``{"train": False}`` or ``{"method": module.encode}``).
    """
    frozen_state = dict(state) if state else {}
    rng_names = tuple(rngs)
    extra = dict(apply_kwargs) if apply_kwargs else {}

    def model_fn(params, inputs):
        if rng_names and state_in_batch:
            x, key, st = inputs
        elif rng_names:
            x, key = inputs
            st = frozen_state
        elif state_in_batch:
            x, st = inputs
            key = None
        else:
            x, st = inputs, frozen_state
        if rng_names:
            rng_dict = {
                name: jax.random.fold_in(key, i)
                for i, name in enumerate(rng_names)
            }
        else:
            rng_dict = None
        variables = {"params": params, **st}
        return module.apply(variables, x, rngs=rng_dict, **extra)

    return HFModelFns(
        model_fn=model_fn, loss_outer=loss_outer, loss_reg=loss_reg
    )


def flax_state_update(
    module: Any,
    params: Any,
    state: dict,
    x: Any,
    *,
    rngs: Optional[dict] = None,
    apply_kwargs: Optional[dict] = None,
) -> dict:
    """One forward pass with the non-param collections mutable; returns the
    refreshed state (e.g. train-mode BatchNorm statistics).

    Call this BETWEEN HF steps (typically with ``apply_kwargs`` putting the
    module in training mode) when running statistics should track the data;
    inside a step the state stays frozen by design.
    """
    variables = {"params": params, **state}
    _, new_state = module.apply(
        variables,
        x,
        mutable=list(state.keys()),
        rngs=rngs,
        **(apply_kwargs or {}),
    )
    return dict(new_state)


def haiku_fns(
    transformed: Any,
    loss_outer: Optional[Callable[[Any, Any], jax.Array]] = None,
    *,
    state: Optional[Any] = None,
    state_in_batch: bool = False,
    rng_in_batch: bool = False,
    apply_kwargs: Optional[dict] = None,
    loss_reg: Optional[Callable[[Any], jax.Array]] = None,
) -> HFModelFns:
    """Wrap a ``hk.transform`` / ``hk.transform_with_state`` result as
    :class:`HFModelFns` (split form).

    Pass the *raw* transform (not ``without_apply_rng`` -- the adapter
    supplies the rng argument positionally: ``None`` by default, which haiku
    accepts for modules that don't consume randomness).  With
    ``rng_in_batch=True``, batch inputs must be ``(x, key)`` and the batch
    key is passed as the apply rng (one key per step; the stochastic-model
    pattern).

    ``state``: the state returned by ``transform_with_state``'s ``init``.
    It is closed over and FROZEN: the adapter calls
    ``apply(params, state, rng, x)`` and discards the new state, so run
    stateful layers (e.g. ``hk.BatchNorm``) in inference mode and refresh
    between steps with :func:`haiku_state_update`.  ``state_in_batch=True``
    instead takes the state from the batch -- inputs ``(x, state)``, or
    ``(x, key, state)`` with ``rng_in_batch`` -- so refreshing it between
    steps reuses the compiled program (see :func:`flax_fns`).
    """
    extra = dict(apply_kwargs) if apply_kwargs else {}

    def model_fn(params, inputs):
        if rng_in_batch and state_in_batch:
            x, key, st = inputs
        elif rng_in_batch:
            x, key = inputs
            st = state
        elif state_in_batch:
            x, st = inputs
            key = None
        else:
            x, key, st = inputs, None, state
        if st is not None:
            out, _ = transformed.apply(params, st, key, x, **extra)
            return out
        return transformed.apply(params, key, x, **extra)

    return HFModelFns(
        model_fn=model_fn, loss_outer=loss_outer, loss_reg=loss_reg
    )


def haiku_state_update(
    transformed: Any,
    params: Any,
    state: Any,
    x: Any,
    *,
    key: Optional[jax.Array] = None,
    apply_kwargs: Optional[dict] = None,
) -> Any:
    """One ``transform_with_state`` forward; returns the refreshed state.

    Call BETWEEN HF steps (typically with ``apply_kwargs`` setting the
    module's training flag) when running statistics should track the data.
    """
    _, new_state = transformed.apply(
        params, state, key, x, **(apply_kwargs or {})
    )
    return new_state
