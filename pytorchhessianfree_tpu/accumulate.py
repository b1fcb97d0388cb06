"""Chunked accumulation of loss / gradient / curvature matvecs.

TPU-native rebuild of the reference's ``acc_step`` machinery
(reference optimizer.py:519-814): the loss, gradient and curvature matvec
are each evaluated over *independent* lists of mini-batches and accumulated
as ``result += N_i * r_i`` then ``/ num_data`` for ``reduction="mean"``,
plain sums for ``"sum"`` (reference optimizer.py:678-684).  This enables
effective batch sizes far beyond device memory.

Two data layouts are supported:

- **stacked**: ``(inputs, targets)`` with a leading chunk axis
  ``[C, N, ...]`` -- accumulated with ``lax.scan`` (O(1) compiled size,
  uniform chunk shapes, the jit-friendly fast path);
- **list**: a Python list of ``(inputs, targets)`` tuples with arbitrary
  (ragged) per-chunk batch sizes -- unrolled at trace time, matching the
  reference's ragged datalists (reference tests/test_optimizer_acc.py uses
  N_list = [7, 8]).

Like the reference (whose docstring admits the inefficiency,
reference optimizer.py:536-541), the matvec accumulator re-runs one
forward + linearization per chunk *per CG iteration*; the data-parallel mesh
path in ``parallel/`` is the scalable alternative.
"""

from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .config import HFConfig
from .ops.curvature import ggnvp_fn, hvp_fn
from .utils.flatten import TrainableRavel

Datalist = Union[Tuple[jax.Array, jax.Array], Sequence[Tuple[jax.Array, jax.Array]]]


class StackedData(NamedTuple):
    """Explicitly-marked stacked datalist: ``inputs [C, N, ...]`` plus a
    targets pytree whose leaves are ``[C, N, ...]``.

    A plain ``(inputs, targets)`` 2-tuple is *also* accepted as stacked for
    backward compatibility, but the structural sniffing cannot distinguish a
    stacked datalist from one single batch -- a single batch passed where a
    datalist is expected would be silently re-chunked with the batch axis as
    the chunk axis.  Pass ``StackedData(xs, ys)`` (or a one-element list
    ``[(x, y)]`` for a single chunk) to be unambiguous.
    """

    inputs: Any
    targets: Any


def _is_stacked(data: Datalist) -> bool:
    if isinstance(data, StackedData):
        return True
    return (
        isinstance(data, tuple)
        and len(data) == 2
        and hasattr(data[0], "ndim")
    )


def _first_leaf(t):
    return jax.tree_util.tree_leaves(t)[0]


def _chunks(data: Datalist) -> List[Tuple[jax.Array, jax.Array]]:
    if _is_stacked(data):
        xs, ys = data
        # inputs may be a pytree too (e.g. dict-of-arrays features)
        take = lambda t, i: jax.tree_util.tree_map(lambda a: a[i], t)
        return [
            (take(xs, i), take(ys, i))
            for i in range(_first_leaf(xs).shape[0])
        ]
    return list(data)


def acc_reduce(
    data: Datalist,
    eval_chunk: Callable[[jax.Array, jax.Array], Any],
    reduction: str,
) -> Any:
    """Accumulate ``eval_chunk(inputs, targets)`` over chunks.

    Weighted-sum semantics of the reference ``_acc``
    (reference optimizer.py:608-684): per chunk of size ``N``, add
    ``N * result`` (mean) or ``result`` (sum); divide by the total count for
    the mean.  Stacked data uses ``lax.scan`` (uniform N, so the weight is
    constant); lists are unrolled with exact per-chunk weights.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"Invalid reduction {reduction}")

    if _is_stacked(data):
        xs, ys = data
        y0 = _first_leaf(ys)  # targets may be a pytree (e.g. (y, weights))
        C, N = y0.shape[0], y0.shape[1]

        def body(acc, xy):
            r = eval_chunk(*xy)
            w = N if reduction == "mean" else 1
            return jax.tree_util.tree_map(lambda a, b: a + w * b, acc, r), None

        y_first = jax.tree_util.tree_map(lambda a: a[0], ys)
        zero = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda: eval_chunk(xs[0], y_first)),
        )
        total, _ = jax.lax.scan(body, zero, (xs, ys))
        if reduction == "mean":
            total = jax.tree_util.tree_map(lambda a: a / (C * N), total)
        return total

    total = None
    num_data = 0
    for x, y in data:
        N = int(_first_leaf(y).shape[0])
        num_data += N
        r = eval_chunk(x, y)
        w = N if reduction == "mean" else 1
        r = jax.tree_util.tree_map(lambda b: w * b, r)
        total = (
            r
            if total is None
            else jax.tree_util.tree_map(lambda a, b: a + b, total, r)
        )
    if reduction == "mean":
        total = jax.tree_util.tree_map(lambda a: a / num_data, total)
    return total


def acc_loss(
    fns, params, data: Datalist, reduction: str
) -> jax.Array:
    """Accumulated loss (reference optimizer.py:686-723).

    A params-dependent regularizer (``fns.loss_reg``) is added ONCE after
    the chunked accumulation -- it does not depend on the data, so weighting
    it per chunk would scale it by the chunk count under "sum" (the
    reference's ``acc_step`` has no regularizer hook at all; this is the
    rebuild's consistent extension of its weighted-sum semantics).
    """
    loss = acc_reduce(
        data, lambda x, y: fns.data_loss(params, (x, y)), reduction
    )
    if fns.loss_reg is not None:
        loss = loss + fns.loss_reg(params)
    return loss


def acc_grad(
    fns, params, data: Datalist, reduction: str, ravel: TrainableRavel
) -> jax.Array:
    """Accumulated flat gradient (reference optimizer.py:725-765); the
    regularizer gradient is added once after the chunked accumulation."""

    def chunk_grad(x, y):
        g = jax.grad(lambda p: fns.data_loss(p, (x, y)))(params)
        return ravel.ravel(g)

    grad = acc_reduce(data, chunk_grad, reduction)
    if fns.loss_reg is not None:
        grad = grad + ravel.ravel(jax.grad(fns.loss_reg)(params))
    return grad


def make_acc_mvp(
    fns,
    config: HFConfig,
    params,
    data: Datalist,
    reduction: str,
    ravel: TrainableRavel,
    amortize: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Accumulated curvature matvec (reference optimizer.py:767-814).

    Default (``amortize=False``): every call re-derives the chunk curvature
    products (fresh linearization per chunk), exactly like the reference's
    per-CG-iteration forward+backward per mini-batch -- O(chunk) memory.

    ``amortize=True`` (GGN + stacked data only): linearize the whole-datalist
    model ONCE and reuse it for every CG iteration -- the multi-chunk analog
    of the single-batch graph reuse (reference optimizer.py:231-233).  Trades
    residual memory for a large per-iteration saving; something the
    reference's autograd design cannot express across batches.
    """
    if reduction not in ("mean", "sum"):
        # validate on EVERY path -- the amortized branch returns before
        # acc_reduce's check would run, and a typo'd reduction silently
        # meaning "sum" scales the curvature C*N-fold vs the gradient
        raise ValueError(f"Invalid reduction {reduction}")
    if amortize and config.curvature_opt == "ggn" and _is_stacked(data):
        xs, ys = data
        C = _first_leaf(ys).shape[0]  # targets may be a pytree
        w = 1.0 / C if reduction == "mean" else 1.0

        def total_model(p):
            # one scanned forward over all chunks; linearize stores the
            # per-chunk residuals once
            return jax.lax.map(lambda x: fns.model_fn(p, x), xs)

        def total_outer(stacked_out):
            losses = jax.vmap(fns.loss_outer)(stacked_out, ys)
            return w * jnp.sum(losses)

        _, _, _, gv = ggnvp_fn(total_model, total_outer, params)

        def mvp_amortized(v: jax.Array) -> jax.Array:
            return ravel.ravel(gv(ravel.unravel(v)))

        return mvp_amortized

    def mvp(v: jax.Array) -> jax.Array:
        tangent = ravel.unravel(v)

        def chunk_mvp(x, y):
            if config.curvature_opt == "ggn":
                _, _, _, gv = ggnvp_fn(
                    lambda p: fns.model_fn(p, x),
                    lambda o: fns.loss_outer(o, y),
                    params,
                )
                return ravel.ravel(gv(tangent))
            _, _, hv = hvp_fn(lambda p: fns.data_loss(p, (x, y)), params)
            return ravel.ravel(hv(tangent))

        out = acc_reduce(data, chunk_mvp, reduction)
        if config.curvature_opt == "hessian" and fns.loss_reg is not None:
            # The Hessian of the regularized objective includes the reg
            # Hessian exactly once (matching the single-batch Hessian path);
            # the GGN excludes it by definition (curvature through outputs).
            reg_hv = jax.jvp(jax.grad(fns.loss_reg), (params,), (tangent,))[1]
            out = out + ravel.ravel(reg_hv)
        return out

    return mvp


def pad_ragged_datalist(datalist):
    """Pad a ragged datalist to uniform chunks + per-sample weights.

    SURVEY.md lists this as a hard part of the rebuild: the reference's
    datalists may have differing chunk sizes with per-chunk ``N_i`` weighting
    (reference optimizer.py:554-559, :678-684), but ragged shapes don't jit
    as a single scanned program.  This helper pads every chunk to the largest
    size (repeating the last row) and returns 0/1 sample weights plus the
    true total count, enabling the ``lax.scan`` fast path via
    :func:`weighted_fns`.

    Returns:
        ``(xs [C, Nmax, ...], ys [C, Nmax, ...], w [C, Nmax], total)`` --
        ``total`` is the real (unpadded) sample count.
    """
    chunks = list(datalist)
    n_max = max(int(y.shape[0]) for _, y in chunks)
    xs, ys, ws = [], [], []
    total = 0
    for x, y in chunks:
        n = int(y.shape[0])
        total += n
        pad = n_max - n
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
            y = jnp.concatenate([y, jnp.repeat(y[-1:], pad, axis=0)])
        xs.append(x)
        ys.append(y)
        ws.append(
            jnp.concatenate(
                [jnp.ones((n,), x.dtype), jnp.zeros((pad,), x.dtype)]
            )
        )
    return jnp.stack(xs), jnp.stack(ys), jnp.stack(ws), total


def weighted_fns(model_fn, per_sample_loss, total, reduction: str = "mean"):
    """Model fns over weight-augmented batches for padded ragged datalists.

    ``per_sample_loss(outputs, targets) -> [N]`` per-sample losses.  The
    returned :class:`~pytorchhessianfree_tpu.optimizer.HFModelFns` treats the
    batch as ``(inputs, (targets, weights))`` and its loss is the weighted
    SUM divided by ``total`` (for "mean") -- so accumulating the padded
    stacked datalist with ``reduction="sum"`` reproduces the exact ragged
    mean/sum semantics of the reference accumulator, chunk sizes and all:

        hf_acc_step(..., loss_data=(xs, (ys, w)), reduction="sum")
    """
    from .optimizer import HFModelFns

    if reduction not in ("mean", "sum"):
        raise ValueError(f"Invalid reduction {reduction}")
    denom = float(total) if reduction == "mean" else 1.0

    def loss_outer(outputs, targets_and_w):
        targets, w = targets_and_w
        return jnp.sum(per_sample_loss(outputs, targets) * w) / denom

    return HFModelFns(model_fn=model_fn, loss_outer=loss_outer)


def concat_datalist(data: Datalist) -> Tuple[Any, Any]:
    """Concatenate a datalist into one big batch (used by the reduction
    self-test, reference optimizer.py:870-877).

    Inputs and targets may be pytrees (e.g. the ``(targets, weights)`` layout
    produced by :func:`pad_ragged_datalist` / :func:`weighted_fns`); every
    leaf is concatenated along its leading axis.
    """
    chunks = _chunks(data)
    cat = lambda *leaves: jnp.concatenate(leaves, axis=0)
    xs = jax.tree_util.tree_map(cat, *[x for x, _ in chunks])
    ys = jax.tree_util.tree_map(cat, *[y for _, y in chunks])
    return xs, ys
