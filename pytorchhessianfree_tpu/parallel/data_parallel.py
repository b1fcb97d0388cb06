"""Data-parallel Hessian-free steps over a device mesh.

TPU-native replacement for the capability the reference reaches via
sequential accumulation (``acc_step``, reference optimizer.py:519-606) and
which it explicitly lacks as a distributed backend (SURVEY.md 2.3: no
NCCL/MPI/Gloo).  Gradient, loss and curvature-matvec accumulation are linear
reductions, so they map onto mesh collectives:

- **GSPMD path** (:func:`make_dp_hf_step`): jit the unchanged single-device
  step with the batch sharded over the ``data`` axis and params/state
  replicated.  XLA's SPMD partitioner inserts the per-matvec / per-gradient
  ``psum``s over ICI automatically -- the idiomatic TPU formulation.
- **shard_map path** (:func:`make_dp_hf_step_shardmap`): explicit per-device
  residency -- the user loss functions are wrapped so every loss evaluation
  becomes ``pmean``/``psum`` of the local-shard value, and the whole step
  core runs replicated inside one ``shard_map``.  Same math, collectives
  placed by hand; useful for verification and for controlling collective
  granularity.

Equivalence with the single-device step is the rebuild's analog of the
reference's step == acc_step trajectory test
(reference tests/test_optimizer_acc.py:124-175).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HFConfig
from ..optimizer import HFModelFns, hf_step, precond_arg
from ..utils.flatten import TrainableRavel


def make_dp_hf_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
    precond_exponent: float = 0.75,
    donate: bool = False,
):
    """GSPMD data-parallel step: batch sharded, params/state replicated.

    Returns ``step(params, state, batch, precond_diag=None)``.  The batch's
    leading dimension must be divisible by the mesh ``data`` axis size.  All
    collectives are derived by XLA from the sharding annotations.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    @functools.partial(
        jax.jit,
        static_argnames=("use_precond",),
        donate_argnums=(0, 1) if donate else (),
        out_shardings=repl,
    )
    def _step(params, state, batch, precond_diag, use_precond):
        return hf_step(
            params,
            state,
            batch,
            fns=fns,
            config=config,
            ravel=ravel,
            precond_diag=precond_diag if use_precond else None,
            precond_exponent=precond_exponent,
        )

    def step(params, state, batch, precond_diag=None):
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), batch
        )
        precond_diag, use_precond = precond_arg(precond_diag, ravel)
        if use_precond:
            precond_diag = jax.device_put(precond_diag, repl)
        return _step(params, state, batch, precond_diag, use_precond)

    return step


def _dp_wrap_fns(
    fns: HFModelFns, axis_name: str, reduction: str
) -> HFModelFns:
    """Wrap user loss fns so a per-shard evaluation yields the global value.

    For ``reduction="mean"`` with equal shards, the global mean is the
    ``pmean`` of local means; for ``"sum"`` it is the ``psum`` of local sums
    -- exactly the weighted-sum semantics of the reference accumulator
    (reference optimizer.py:678-684) with one chunk per device.
    Differentiating through the collective produces the correct gradient and
    curvature collectives automatically.
    """
    combine = (
        functools.partial(jax.lax.pmean, axis_name=axis_name)
        if reduction == "mean"
        else functools.partial(jax.lax.psum, axis_name=axis_name)
    )

    # loss_reg is params-only: params are replicated, so the per-device reg
    # value is already the global one -- only the data term is combined.
    if fns.loss_fn is not None:
        def loss_fn(params, batch):
            return combine(fns.loss_fn(params, batch))
        return HFModelFns(loss_fn=loss_fn, loss_reg=fns.loss_reg)

    def loss_outer(outputs, targets):
        return combine(fns.loss_outer(outputs, targets))

    return HFModelFns(
        model_fn=fns.model_fn, loss_outer=loss_outer, loss_reg=fns.loss_reg
    )


def make_dp_hf_step_shardmap(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
    reduction: str = "mean",
    precond_exponent: float = 0.75,
):
    """Explicit shard_map data-parallel step.

    Each device holds a batch shard; params, optimizer state and the entire
    CG solve are replicated (every device computes identical iterates, as the
    collectives make all reduced quantities bitwise-identical across
    devices).  The only cross-device traffic is one ``pmean``/``psum`` per
    loss / gradient / curvature-matvec evaluation, riding ICI.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"Invalid reduction {reduction}")
    dp_fns = _dp_wrap_fns(fns, axis_name, reduction)

    @functools.partial(
        jax.jit, static_argnames=("use_precond",)
    )
    def step_jit(params, state, batch, precond_diag, use_precond):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_name), P()),
            out_specs=P(),
        )
        def inner(params, state, batch, precond_diag):
            return hf_step(
                params,
                state,
                batch,
                fns=dp_fns,
                config=config,
                ravel=ravel,
                precond_diag=precond_diag if use_precond else None,
                precond_exponent=precond_exponent,
            )

        return inner(params, state, batch, precond_diag)

    def step(params, state, batch, precond_diag=None):
        precond_diag, use_precond = precond_arg(precond_diag, ravel)
        return step_jit(params, state, batch, precond_diag, use_precond)

    return step


def make_dp_hf_train_loop(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
    precond_exponent: float = 0.75,
    donate: bool = False,
    precond_ema_decay: Optional[float] = None,
):
    """Data-parallel scan-of-steps training loop: the GSPMD analog of
    :func:`~pytorchhessianfree_tpu.optimizer.make_hf_train_loop` --
    ``batches`` leaves are stacked ``[T, N, ...]`` with the batch axis
    sharded over ``axis_name`` (N divisible by the axis size),
    params/state replicated; XLA derives the per-step collectives from the
    sharding annotations exactly as in :func:`make_dp_hf_step`.

    Same signature/return as the single-device loop (incl. the
    ``precond_ema_decay`` EMA carry, whose diagonal is a per-sample
    reduction and therefore ends up replicated).
    """
    from ..optimizer import make_hf_train_loop

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(None, axis_name))
    inner = make_hf_train_loop(
        fns, config, ravel,
        precond_exponent=precond_exponent,
        donate=donate,
        precond_ema_decay=precond_ema_decay,
    )

    def loop(params, state, batches, ema_state=None):
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        batches = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), batches
        )
        if precond_ema_decay is not None:
            return inner(params, state, batches, ema_state)
        return inner(params, state, batches)

    return loop


def make_dp_hf_acc_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
    reduction: str = "mean",
    precond_exponent: float = 0.75,
    mvp_amortize: bool = False,
):
    """GSPMD accumulation x data parallelism: the stacked datalist is
    scanned C chunks deep in time with each chunk's BATCH axis sharded over
    the mesh; XLA derives the per-chunk collectives.  The GSPMD sibling of
    :func:`make_dp_hf_acc_step_shardmap` (same math, annotations instead of
    explicit psums), with preconditioner support.

    Returns ``step(params, state, loss_data, precond_diag=None)`` with
    ``loss_data`` a stacked ``(xs [C, N, ...], ys [C, N, ...])`` pytree.
    """
    from ..optimizer import hf_acc_step

    repl = NamedSharding(mesh, P())
    chunk_s = NamedSharding(mesh, P(None, axis_name))

    @functools.partial(
        jax.jit, static_argnames=("use_precond",), out_shardings=repl
    )
    def _step(params, state, loss_data, precond_diag, use_precond):
        return hf_acc_step(
            params,
            state,
            fns=fns,
            config=config,
            ravel=ravel,
            loss_data=loss_data,
            reduction=reduction,
            precond_diag=precond_diag if use_precond else None,
            precond_exponent=precond_exponent,
            mvp_amortize=mvp_amortize,
        )

    def step(params, state, loss_data, precond_diag=None):
        from ..accumulate import _is_stacked

        if not _is_stacked(loss_data):
            raise ValueError(
                "make_dp_hf_acc_step requires a STACKED datalist "
                "(xs [C, N, ...], ys [C, N, ...]); see "
                "accumulate.pad_ragged_datalist for ragged chunks."
            )
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        loss_data = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, chunk_s), loss_data
        )
        precond_diag, use_precond = precond_arg(precond_diag, ravel)
        if use_precond:
            precond_diag = jax.device_put(precond_diag, repl)
        return _step(params, state, loss_data, precond_diag, use_precond)

    return step


def make_dp_hf_acc_step_shardmap(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
    reduction: str = "mean",
):
    """Accumulation x data parallelism, explicit shard_map formulation.

    The stacked datalist keeps its chunk axis ([C, N, ...]); each chunk's
    BATCH axis is sharded over the mesh, so every device scans the same C
    chunks over its local rows and each per-chunk loss / gradient /
    curvature-matvec evaluation psum/pmeans into the global value -- the
    reference's sequential large-batch mechanism (acc_step, reference
    optimizer.py:519-606) running C-deep in time and mesh-wide in space.

    Returns ``step(params, state, loss_data)`` with ``loss_data`` a stacked
    ``(xs [C, N, ...], ys [C, N, ...])`` pytree; N must be divisible by the
    mesh axis size.
    """
    from ..optimizer import hf_acc_step

    if reduction not in ("mean", "sum"):
        raise ValueError(f"Invalid reduction {reduction}")
    dp_fns = _dp_wrap_fns(fns, axis_name, reduction)

    @jax.jit
    def step_jit(params, state, loss_data):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis_name)),
            out_specs=P(),
        )
        def inner(params, state, loss_data):
            return hf_acc_step(
                params,
                state,
                fns=dp_fns,
                config=config,
                ravel=ravel,
                loss_data=loss_data,
                reduction=reduction,
            )

        return inner(params, state, loss_data)

    return step_jit


def _dp_diag_jit(fns, reduction, ravel, repl):
    # Cache compiled programs ON the ravel instance (not a module-level
    # lru_cache): entries die with their owner instead of pinning the
    # closure's params-scale objects for process lifetime, and HFModelFns
    # (a NamedTuple) keys by content so logically-equal instances hit.
    cache = getattr(ravel, "_dp_diag_cache", None)
    if cache is None:
        cache = ravel._dp_diag_cache = {}
    # The ambient matmul precision (precision_ctx) is captured at trace
    # time, so it must be part of the cache key.
    prec = getattr(jax.config, "jax_default_matmul_precision", None)
    key = (fns, reduction, repl, prec)
    compute = cache.get(key)
    if compute is not None:
        return compute
    from ..ops.precond import diag_EF

    @functools.partial(jax.jit, out_shardings=repl)
    def compute(params, inputs, targets):
        return diag_EF(
            fns.model_fn, fns.loss_outer, params, inputs, targets,
            reduction, ravel, loss_reg=fns.loss_reg,
        )

    cache[key] = compute
    return compute


def dp_diag_EF(
    fns: HFModelFns,
    params,
    inputs,
    targets,
    reduction: str,
    ravel: TrainableRavel,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Empirical-Fisher diagonal with per-sample gradients sharded over the
    mesh.

    The diagonal is a per-sample reduction (sum_i g_i^2, reference
    preconditioners.py:17-20), so each device computes the partial sum over
    its batch shard and one ``psum`` combines them -- the batch-sharded
    construction of the preconditioner the sequential reference builds on
    the full batch.  With ``fns.loss_reg``, each per-sample gradient
    includes the shared reg gradient (reference ``diag_EF_autograd``
    regularized semantics), computed identically on every device from the
    replicated params.

    Returns the ``[ravel.dim]`` diagonal, replicated.

    Formulated through GSPMD rather than shard_map: inside ``shard_map``,
    ``jax.grad`` w.r.t. a REPLICATED operand auto-psums the cotangent
    across devices (the mechanism that makes the DP loss wrapping correct),
    which would globally sum each per-sample gradient before squaring --
    wrong for the Fisher diagonal.  Sharding the batch axis under jit lets
    XLA keep the per-sample grads device-local and reduce the squares.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"reduction {reduction} is not supported.")

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    # The jitted program is cached per (fns, reduction, ravel, mesh) --
    # defining it inline would re-trace (and on remote-compile TPUs,
    # re-COMPILE) the per-sample-grad program on every call.
    compute = _dp_diag_jit(fns, reduction, ravel, repl)

    params = jax.device_put(params, repl)
    inputs = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard), inputs
    )
    targets = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard), targets
    )
    return compute(params, inputs, targets)
