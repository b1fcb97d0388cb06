"""Pipeline parallelism: a GPipe-style microbatch schedule over a mesh axis.

The last member of the parallelism family (dp / tensor / solver-state /
context / expert are in ``data_parallel.py`` / ``sharded.py`` /
``models/moe.py``): the LAYER axis of a stacked-block model shards over a
``stage`` mesh axis, each stage holding ``L/S`` consecutive layers, and
microbatches flow stage-to-stage over ICI via ``lax.ppermute`` on a
``shard_map`` grid.  No reference analog (the reference is single-GPU).

Differentiability is the whole point for this framework: the schedule is
built from ``lax.scan`` + ``ppermute`` + masked selects -- all of which
JAX transposes and linearizes -- so the SAME pipelined callable serves the
HF step's gradient, GGN/Hessian jvp+vjp, and every backtracking trial
forward.  Parity with the sequential layer scan is exact (f64-pinned in
``tests/test_pipeline.py``): the schedule only reorders WHERE each layer
runs, never what it computes.

Cost model (document, don't hide): a pipeline fill/drain of ``S + M - 1``
ticks serves ``M`` microbatches, so the bubble fraction is
``(S - 1) / (M + S - 1)`` of every forward, backward and curvature pass.
An HF step runs ~``2 x cg_iters + trials`` such passes, so pp is the
right axis when the model's LAYERS don't fit a chip (weights stream once
per pass regardless), and the wrong axis when FSDP-style solver/param
sharding (``make_sharded_hf_step``) still fits -- use pp for depth, the
model axis for width, data/context axes for tokens.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_blocks(
    stacked_blocks: Any,
    x: jax.Array,
    block_fn: Callable[[Any, jax.Array], jax.Array],
    mesh: Mesh,
    stage_axis: str = "stage",
    n_microbatches: int = 4,
) -> jax.Array:
    """Run ``L`` stacked layers over ``x`` as an ``S``-stage pipeline.

    ``stacked_blocks``: pytree whose leaves carry a leading layer axis
    ``[L, ...]`` (the ``scan_layers`` layout, ``models.stack_blocks``);
    ``L`` must divide by the stage-axis size ``S`` -- stage ``s`` holds
    layers ``[s*L/S, (s+1)*L/S)`` and scans them locally.  ``x``:
    ``[N, ...]`` activations; ``N`` must divide by ``n_microbatches``
    (microbatching is over the batch axis, exact for per-sample models).
    ``block_fn(blk, h) -> h`` is one layer (close over statics like head
    count; wrap in ``jax.checkpoint`` for per-layer remat).  The
    signature is activations-in/activations-out only -- for blocks with
    auxiliary outputs (the MoE block's load-balance aux) wrap them to
    drop the aux, or compute the aux in a separate replicated pass.

    Semantics are IDENTICAL to running the layers sequentially -- the
    GPipe schedule is pure dataflow reordering.  Returns ``[N, ...]``
    replicated over the mesh.
    """
    S = mesh.shape[stage_axis]
    L = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]
    if L % S != 0:
        raise ValueError(
            f"{L} layers do not divide over {S} pipeline stages"
        )
    N = x.shape[0]
    M = n_microbatches
    if N % M != 0:
        raise ValueError(
            f"batch {N} does not divide into {M} microbatches"
        )
    xm = x.reshape(M, N // M, *x.shape[1:])

    def stage_fn(local_blocks, xm):
        # local_blocks leaves: [L/S, ...] -- this stage's layers
        idx = jax.lax.axis_index(stage_axis)

        def run_local(h):
            def body(c, blk):
                return block_fn(blk, c), None

            h, _ = jax.lax.scan(body, h, local_blocks)
            return h

        n_ticks = M + S - 1
        buf = jax.lax.pcast(
            jnp.zeros_like(xm[0]), (stage_axis,), to="varying"
        )
        outs = jax.lax.pcast(jnp.zeros_like(xm), (stage_axis,), to="varying")

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t; later stages consume what the
            # previous stage sent last tick (the skewed GPipe schedule)
            inp = jnp.where(idx == 0, xm[jnp.clip(t, 0, M - 1)], buf)
            out = run_local(inp)
            nxt = jax.lax.ppermute(
                out, stage_axis, [(i, (i + 1) % S) for i in range(S)]
            )
            k = t - (S - 1)  # microbatch finishing at the last stage
            outs = jnp.where(
                (idx == S - 1) & (k >= 0),
                outs.at[jnp.clip(k, 0, M - 1)].set(out),
                outs,
            )
            return (nxt, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(n_ticks)
        )
        # replicate the last stage's collected outputs to every device
        return jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), stage_axis
        )

    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(stage_axis), P()),
        out_specs=P(),
    )(stacked_blocks, xm)
    return out.reshape(N, *x.shape[1:])
