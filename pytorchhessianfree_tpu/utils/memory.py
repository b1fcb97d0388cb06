"""Solver working-set estimation: what one HF step keeps live in HBM.

The reference gives no sizing guidance (its iterate list simply grows on
one GPU, reference cg.py:187-210); on TPU the dominant buffers are
statically known, so users can size batch, ``cg_max_iter`` and the mesh
before compiling.  Estimates cover the SOLVER's flat-vector working set --
model activations / autodiff residuals of the user's network are model-
specific and excluded (they scale with batch size, not ``ravel.dim``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import HFConfig
from ..ops.cg import storing_grid
from .flatten import TrainableRavel


def solver_memory_bytes(
    ravel: TrainableRavel,
    config: HFConfig,
    model_axis_size: int = 1,
) -> dict:
    """Bytes of solver state live during one HF step.

    Args:
        ravel: the flat vector space (``ravel.dim`` entries of
            ``ravel.dtype``).
        config: the step configuration (CG iteration cap, backtracking
            grid, storage dtype).
        model_axis_size: devices the CG space is sharded over
            (:func:`~pytorchhessianfree_tpu.parallel.make_sharded_hf_step`);
            1 = single device / replicated.

    Returns a dict with per-buffer byte counts, ``total`` and
    ``per_device`` (= total / model_axis_size -- every counted buffer
    shards over the model axis).
    """
    if model_axis_size < 1:
        raise ValueError(f"Invalid model_axis_size {model_axis_size}")
    n = ravel.dim
    vec_bytes = n * jnp.dtype(ravel.dtype).itemsize

    max_iter = (
        config.cg_max_iter if config.cg_max_iter is not None else n
    )
    if config.use_cg_backtracking:
        G = len(storing_grid(max_iter, config.cg.grid_gamma))
    else:
        G = 1  # store=(0,): the warm-start row only
    sdtype = (
        jnp.dtype(config.cg.store_dtype)
        if config.cg.store_dtype is not None
        else jnp.dtype(ravel.dtype)
    )
    # store_mode="cond" (default) has no scratch row; "scratch" adds one
    rows = G + 1 if config.cg.store_mode == "scratch" else max(G, 1)
    grid_bytes = rows * n * sdtype.itemsize

    # carried through the while_loop: x, r, p (+ y when preconditioned,
    # counted as the precond diagonal's application scratch), plus the
    # gradient (CG rhs), the warm start and the chosen step vector
    n_vectors = 6
    vectors_bytes = n_vectors * vec_bytes
    precond_bytes = vec_bytes if config.precond != "none" else 0

    total = vectors_bytes + grid_bytes + precond_bytes
    return {
        "flat_dim": n,
        "vector_bytes": vec_bytes,
        "cg_vectors_bytes": vectors_bytes,
        "iterate_grid_rows": rows,
        "iterate_grid_bytes": grid_bytes,
        "precond_diag_bytes": precond_bytes,
        "total": total,
        "per_device": total // model_axis_size,
    }


def format_solver_memory(
    ravel: TrainableRavel,
    config: HFConfig,
    model_axis_size: int = 1,
) -> str:
    """Human-readable sizing summary."""
    m = solver_memory_bytes(ravel, config, model_axis_size)
    mb = 1024.0**2

    def f(b):
        return f"{b / mb:,.1f} MB"

    lines = [
        f"flat dim {m['flat_dim']:,} ({f(m['vector_bytes'])}/vector)",
        f"CG vectors: {f(m['cg_vectors_bytes'])}",
        f"iterate grid [{m['iterate_grid_rows']} rows]: "
        f"{f(m['iterate_grid_bytes'])}",
    ]
    if m["precond_diag_bytes"]:
        lines.append(f"precond diagonal: {f(m['precond_diag_bytes'])}")
    lines.append(f"total: {f(m['total'])}")
    if model_axis_size > 1:
        lines.append(
            f"per device (model axis {model_axis_size}): "
            f"{f(m['per_device'])}"
        )
    return "\n".join(lines)
