"""Solver-state-sharded Hessian-free steps over a 2-D (data x model) mesh.

The reference is single-device and scales batches only by sequential
accumulation (reference optimizer.py:519-606); its largest memory consumer
-- the CG iterate-storage grid used by backtracking (reference cg.py:152-170,
a ``len(grid) x n_params`` list of vectors) -- lives whole on one GPU.  On a
TPU mesh that buffer, and the entire CG vector space with it, shard
naturally: every CG operation is either elementwise over the flat
``[n]`` vectors (axpy updates, preconditioner application) or a dot product
(one ``psum`` over the model axis), so sharding the vectors over a ``model``
mesh axis splits the optimizer's working set ~evenly across devices -- the
ZeRO/FSDP formulation of a second-order solver.

Composition with data parallelism is a 2-D mesh ``(data, model)``:

- the BATCH is sharded over ``data`` -- XLA turns the loss/gradient/matvec
  reductions into ``psum``s over that axis (same mechanism as
  :func:`make_dp_hf_step`);
- the flat CG vectors (iterate, residual, direction, warm start, gradient,
  preconditioner diagonal) and the iterate-storage grid are sharded
  over ``model`` -- vector memory and elementwise traffic split across the
  axis, dots gain one small ``psum``;
- model parameters are replicated by default, or sharded with user-provided
  ``param_specs`` (tensor parallelism): XLA's SPMD partitioner then
  partitions the forward/backward and the all-gathers between the flat
  space and the parameter pytree follow from the specs.

Everything is GSPMD: the step body is the UNCHANGED single-device
:func:`~pytorchhessianfree_tpu.optimizer.hf_step`; only sharding
annotations (jit in/out shardings plus ``lax.with_sharding_constraint``
hooks threaded into the CG loop) differ.  Trajectories are identical to the
single-device step up to reduction order.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HFConfig
from ..optimizer import HFModelFns, HFState, hf_step, precond_arg
from ..utils.flatten import TrainableRavel


def _as_sharding(mesh: Mesh, spec_or_sharding):
    if isinstance(spec_or_sharding, NamedSharding):
        return spec_or_sharding
    return NamedSharding(mesh, spec_or_sharding)


def _param_shardings(mesh: Mesh, params: Any, param_specs: Optional[Any]):
    """Pytree of NamedShardings for the parameter pytree.

    ``param_specs`` may be ``None`` (fully replicated), a single
    ``PartitionSpec`` applied to every leaf, or a TREE PREFIX of the
    parameter structure whose leaves are specs / ``NamedSharding``s /
    ``None`` (= replicated) -- a spec at an interior position broadcasts
    over the whole parameter subtree (e.g. one ``P()`` for a layernorm's
    ``{"scale", "bias"}`` dict), the same prefix semantics as jit's
    ``in_shardings``.
    """
    repl = NamedSharding(mesh, P())
    if param_specs is None:
        return jax.tree_util.tree_map(lambda _: repl, params)
    if isinstance(param_specs, (P, NamedSharding)):
        s = _as_sharding(mesh, param_specs)
        return jax.tree_util.tree_map(lambda _: s, params)

    is_spec = lambda x: x is None or isinstance(x, (P, NamedSharding))

    def expand(spec, params_subtree):
        s = repl if spec is None else _as_sharding(mesh, spec)
        return jax.tree_util.tree_map(lambda _: s, params_subtree)

    # tree_map flattens `params` UP TO param_specs' structure, handing each
    # spec leaf its parameter subtree -- prefix broadcasting.
    return jax.tree_util.tree_map(
        expand, param_specs, params, is_leaf=is_spec
    )


def _place_batch(mesh, batch, batch_specs, default_s, stacked=False):
    """``device_put`` the batch pytree onto the mesh.

    With ``batch_specs=None`` every leaf gets ``default_s`` (the batch axis
    sharded over the data axis -- the plain-DP layout).  Otherwise
    ``batch_specs`` is a TREE PREFIX of the batch structure whose leaves
    are ``PartitionSpec``s / ``None``, the same prefix semantics as
    ``param_specs``.  A ``None`` LEAF inherits ``default_s`` (the DP
    layout) -- same rule as ``param_specs``, where ``None`` also means
    "the default layout for this tree" (which for params is replicated) --
    so sharding one leaf specially does not silently un-DP the others;
    request replication explicitly with an empty ``P()``.  Specs describe
    ONE step's batch; when ``stacked`` (acc_step chunks, train-loop time
    axis) the leading stacking axis is prepended as unsharded
    automatically (``default_s`` is already the stacked layout).

    This is the context-parallelism hook: e.g. tokens ``[N, T]`` with
    ``P("data", "model")`` shard the SEQUENCE axis over the model axis --
    GSPMD partitions the position-wise model code for free and inserts
    k/v all-gathers only where attention mixes positions.
    """
    if batch_specs is None:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, default_s), batch
        )
    is_spec = lambda s: s is None or isinstance(s, P)

    def put(spec, subtree):
        if spec is None:
            # inherit the builder's default (DP) layout; explicit P() for
            # replication.  default_s is None only in direct helper calls.
            s = default_s if default_s is not None else NamedSharding(
                mesh, P()
            )
        else:
            if stacked:
                spec = P(*((None,) + tuple(spec)))
            s = NamedSharding(mesh, spec)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, s), subtree
        )

    return jax.tree_util.tree_map(put, batch_specs, batch, is_leaf=is_spec)


def _prepare(
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    data_axis: Optional[str],
    model_axis: str,
):
    """Validate the mesh/flat-space fit and build the sharding hooks."""
    if model_axis not in mesh.axis_names:
        raise ValueError(
            f"Mesh {mesh.axis_names} has no axis named {model_axis!r}."
        )
    msize = mesh.shape[model_axis]
    if ravel.dim % msize != 0:
        raise ValueError(
            f"Flat dimension {ravel.dim} is not divisible by the "
            f"{model_axis!r} axis size {msize}; construct the TrainableRavel "
            f"with pad_to_multiple a multiple of {msize} (the default 1024 "
            "covers power-of-two axes)."
        )
    use_data = data_axis is not None and data_axis in mesh.axis_names

    # Each stored iterate is a row of a [rows, n] buffer sharded along n --
    # the flat 1-D layout would scatter across shard boundaries.
    if config.cg.buffer_layout != "rows":
        config = dataclasses.replace(
            config, cg=dataclasses.replace(config.cg, buffer_layout="rows")
        )

    repl = NamedSharding(mesh, P())
    vec_s = NamedSharding(mesh, P(model_axis))
    buf_s = NamedSharding(mesh, P(None, model_axis))

    def shard_vec(v):
        return jax.lax.with_sharding_constraint(v, vec_s)

    def shard_buf(b):
        return jax.lax.with_sharding_constraint(b, buf_s)

    state_s = HFState(x0=vec_s, damping=repl, step_count=repl)
    return config, use_data, repl, vec_s, buf_s, shard_vec, shard_buf, state_s


class _Placer:
    """Shared input-placement + lazy-jit machinery of the three builders.

    Parameter shardings are resolved from the FIRST params pytree seen
    (``param_specs`` may be a tree prefix that needs the concrete
    structure), the jitted program is built once, and every call places
    params/state/precond on the mesh before dispatch.
    """

    def __init__(self, mesh, param_specs, ravel, vec_s, repl, make_jit):
        self._mesh = mesh
        self._specs = param_specs
        self._ravel = ravel
        self._vec_s = vec_s
        self._repl = repl
        self._make_jit = make_jit
        self._params_s = None
        self._fn = None

    def resolve(self, params):
        """-> (jitted_fn, placed_params)."""
        if self._params_s is None:
            self._params_s = _param_shardings(
                self._mesh, params, self._specs
            )
            self._fn = self._make_jit(self._params_s)
        placed = jax.tree_util.tree_map(
            jax.device_put, params, self._params_s
        )
        return self._fn, placed

    def place_state(self, state: HFState) -> HFState:
        return HFState(
            x0=jax.device_put(state.x0, self._vec_s),
            damping=jax.device_put(state.damping, self._repl),
            step_count=jax.device_put(state.step_count, self._repl),
        )

    def place_precond(self, precond_diag):
        """-> (placed_diag_or_placeholder, use_precond)."""
        precond_diag, use_precond = precond_arg(precond_diag, self._ravel)
        if use_precond:
            precond_diag = jax.device_put(precond_diag, self._vec_s)
        return precond_diag, use_precond


def make_sharded_hf_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    param_specs: Optional[Any] = None,
    precond_exponent: float = 0.75,
    donate: bool = False,
    batch_specs: Optional[Any] = None,
):
    """Build the solver-state-sharded HF step over a (data x model) mesh.

    Returns ``step(params, state, batch, precond_diag=None) ->
    (params, state, stats)`` with

    - batch sharded over ``data_axis`` (skipped when ``data_axis`` is None
      or absent from the mesh -- pure model-axis sharding), or per-leaf
      with ``batch_specs`` (a tree prefix of ``PartitionSpec``s/``None``,
      same prefix semantics as ``param_specs``) -- e.g. tokens ``[N, T]``
      under ``P("data", "model")`` for context parallelism: the sequence
      axis splits over the model axis, position-wise compute partitions
      for free and GSPMD inserts the attention k/v all-gathers,
    - all flat CG vectors, the iterate-storage grid, the warm start carried
      in ``state.x0`` and the optional ``precond_diag`` sharded over
      ``model_axis``,
    - params replicated, or sharded per ``param_specs`` (tensor
      parallelism).

    ``ravel.dim`` must be divisible by the ``model_axis`` size; the default
    ``pad_to_multiple=1024`` flat space satisfies every power-of-two axis up
    to 1024.  The iterate buffer is forced to the ``"rows"`` layout so each
    stored iterate shards along its lane dimension.
    """
    (
        config, use_data, repl, vec_s, buf_s, shard_vec, shard_buf, state_s
    ) = _prepare(config, ravel, mesh, data_axis, model_axis)
    batch_s = NamedSharding(mesh, P(data_axis)) if use_data else repl

    def _make_jit(params_sharding):
        @functools.partial(
            jax.jit,
            static_argnames=("use_precond",),
            donate_argnums=(0, 1) if donate else (),
            out_shardings=(params_sharding, state_s, repl),
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
                shard_vec=shard_vec,
                shard_buf=shard_buf,
            )

        return _step

    placer = _Placer(mesh, param_specs, ravel, vec_s, repl, _make_jit)

    def step(params, state, batch, precond_diag=None):
        fn, params = placer.resolve(params)
        state = placer.place_state(state)
        batch = _place_batch(mesh, batch, batch_specs, batch_s)
        precond_diag, use_precond = placer.place_precond(precond_diag)
        return fn(params, state, batch, precond_diag, use_precond)

    return step


def make_sharded_hf_acc_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    param_specs: Optional[Any] = None,
    reduction: str = "mean",
    precond_exponent: float = 0.75,
    mvp_amortize: bool = False,
    batch_specs: Optional[Any] = None,
):
    """Accumulation x solver-state sharding: the stacked-datalist
    ``acc_step`` (reference optimizer.py:519-606) scanned C chunks deep in
    time, each chunk's batch axis sharded over ``data_axis``, the whole CG
    vector space sharded over ``model_axis``.

    Returns ``step(params, state, loss_data, precond_diag=None)`` where
    ``loss_data`` is a stacked ``(xs [C, N, ...], ys [C, N, ...])`` pytree
    (N divisible by the data-axis size).  ``batch_specs`` (tree prefix of
    ``PartitionSpec``s) describes ONE chunk's leaves -- the stacked chunk
    axis is prepended unsharded automatically.
    """
    from ..optimizer import hf_acc_step

    (
        config, use_data, repl, vec_s, buf_s, shard_vec, shard_buf, state_s
    ) = _prepare(config, ravel, mesh, data_axis, model_axis)
    chunk_s = (
        NamedSharding(mesh, P(None, data_axis)) if use_data else repl
    )

    def _make_jit(params_sharding):
        @functools.partial(
            jax.jit,
            static_argnames=("use_precond",),
            out_shardings=(params_sharding, state_s, repl),
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
                shard_vec=shard_vec,
                shard_buf=shard_buf,
            )

        return _step

    placer = _Placer(mesh, param_specs, ravel, vec_s, repl, _make_jit)

    def step(params, state, loss_data, precond_diag=None):
        from ..accumulate import _is_stacked

        if not _is_stacked(loss_data):
            raise ValueError(
                "make_sharded_hf_acc_step requires a STACKED datalist "
                "(xs [C, N, ...], ys [C, N, ...]); see "
                "accumulate.pad_ragged_datalist for ragged chunks."
            )
        fn, params = placer.resolve(params)
        state = placer.place_state(state)
        loss_data = _place_batch(
            mesh, loss_data, batch_specs, chunk_s, stacked=True
        )
        precond_diag, use_precond = placer.place_precond(precond_diag)
        return fn(params, state, loss_data, precond_diag, use_precond)

    return step


def make_sharded_hf_train_loop(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: str = "model",
    param_specs: Optional[Any] = None,
    precond_exponent: float = 0.75,
    donate: bool = False,
    precond_ema_decay: Optional[float] = None,
    batch_specs: Optional[Any] = None,
):
    """Scan-of-steps training loop with the solver state sharded.

    The sharded analog of
    :func:`~pytorchhessianfree_tpu.optimizer.make_hf_train_loop`:
    ``loop(params, state, batches)`` runs one ``lax.scan`` over full HF
    steps with every CG vector / the iterate grid sharded over
    ``model_axis`` and each step's batch sharded over ``data_axis``
    (``batches`` leaves are stacked ``[T, N, ...]``; the batch axis is the
    second one).  One dispatch per T steps; collectives by XLA.
    ``batch_specs`` (tree prefix of ``PartitionSpec``s) describes ONE
    step's batch leaves -- the stacked time axis is prepended unsharded
    automatically.

    ``precond_ema_decay``: carry an EMA empirical-Fisher diagonal across
    the scanned steps (same semantics as ``make_hf_train_loop``); the EMA
    vector is itself sharded over the model axis.  In this mode the
    signature becomes ``loop(params, state, batches, ema_state=None) ->
    (params, state, stats, ema_state)`` so the EMA carries across loop
    invocations.
    """
    if precond_ema_decay is not None:
        if not 0.0 <= precond_ema_decay < 1.0:
            raise ValueError(f"Invalid decay {precond_ema_decay}")
        if fns.model_fn is None or fns.loss_outer is None:
            raise ValueError(
                "precond_ema_decay requires the split model form "
                "(per-sample gradients need model_fn + loss_outer)."
            )

    (
        config, use_data, repl, vec_s, buf_s, shard_vec, shard_buf, state_s
    ) = _prepare(config, ravel, mesh, data_axis, model_axis)
    batches_s = (
        NamedSharding(mesh, P(None, data_axis)) if use_data else repl
    )

    use_ema = precond_ema_decay is not None

    def _make_jit(params_sharding):
        # The EMA state exists in the compiled program ONLY when enabled --
        # a dead carried vector would change XLA's fusion and hence the f32
        # trajectory of the plain loop.
        ema_out_s = ((vec_s, repl),) if use_ema else ((),)

        @functools.partial(
            jax.jit,
            donate_argnums=(0, 1) if donate else (),
            out_shardings=(params_sharding, state_s, repl) + ema_out_s,
        )
        def _loop(params, state, batches, ema_state):
            def body(carry, batch):
                if use_ema:
                    from ..config import precision_ctx
                    from ..ops.precond import diag_EF

                    p, s, ema, ema_ready = carry
                    inputs, targets = batch
                    with precision_ctx(config):
                        d = shard_vec(
                            diag_EF(
                                fns.model_fn, fns.loss_outer, p, inputs,
                                targets, config.precond_reduction, ravel,
                                loss_reg=fns.loss_reg,
                            )
                        )
                    ema = shard_vec(
                        jnp.where(
                            ema_ready,
                            precond_ema_decay * ema
                            + (1.0 - precond_ema_decay) * d,
                            d,
                        )
                    )
                    ema_ready = jnp.asarray(True)
                    precond_diag = ema
                else:
                    p, s = carry
                    precond_diag = None
                p, s, stats = hf_step(
                    p,
                    s,
                    batch,
                    fns=fns,
                    config=config,
                    ravel=ravel,
                    precond_diag=precond_diag,
                    precond_exponent=precond_exponent,
                    shard_vec=shard_vec,
                    shard_buf=shard_buf,
                )
                carry = (p, s, ema, ema_ready) if use_ema else (p, s)
                return carry, stats

            if use_ema:
                ema0, ema_ready0 = ema_state
                init = (params, state, shard_vec(ema0), ema_ready0)
            else:
                init = (params, state)
            carry, stats = jax.lax.scan(body, init, batches)
            if use_ema:
                params, state, ema, ema_ready = carry
                return params, state, stats, (ema, ema_ready)
            params, state = carry
            return params, state, stats, ()

        return _loop

    placer = _Placer(mesh, param_specs, ravel, vec_s, repl, _make_jit)

    def loop(params, state, batches, ema_state=None):
        fn, params = placer.resolve(params)
        state = placer.place_state(state)
        batches = _place_batch(
            mesh, batches, batch_specs, batches_s, stacked=True
        )
        if use_ema:
            if ema_state is None:
                ema_state = (
                    jnp.zeros((ravel.dim,), ravel.dtype),
                    jnp.asarray(False),
                )
            ema, ema_ready = ema_state
            ema_state = (jax.device_put(ema, vec_s), ema_ready)
        else:
            ema_state = ()
        params, state, stats, ema_state = fn(
            params, state, batches, ema_state
        )
        if not use_ema:
            return params, state, stats
        return params, state, stats, ema_state

    return loop
