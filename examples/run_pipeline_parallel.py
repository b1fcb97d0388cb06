"""Hessian-free training THROUGH a pipeline-parallel model.

The decoder's blocks run as a GPipe microbatch schedule over a 4-stage
mesh axis (`parallel/pipeline.py`): each stage holds L/S consecutive
layers, activations flow stage-to-stage via `lax.ppermute`.  Because the
schedule is pure, differentiable dataflow, the SAME pipelined callable
serves the HF gradient, the GGN jvp/vjp inside CG, and every
backtracking/line-search trial forward -- the optimizer does not know the
model is pipelined.

Run with ``--cpu`` for the virtual device mesh (4 stages); on a real
multi-chip slice the stages map onto ICI neighbors.
"""

import sys

from example_utils import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    init_decoder_lm,
    next_token_loss,
)
from pytorchhessianfree_tpu.models.transformer import (
    _block,
    _layernorm,
    stack_blocks,
)
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.pipeline import pipeline_blocks

VOCAB, T, BATCH = 32, 16, 8
N_LAYERS, N_HEADS, STAGES, MICRO = 4, 4, 4, 2
A, B = 7, 3


def make_batch(key):
    start = jax.random.randint(key, (BATCH,), 0, VOCAB)
    toks = [start]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens


if __name__ == "__main__":
    if len(jax.devices()) < STAGES:
        print(f"only {len(jax.devices())} device(s); run with --cpu")
        sys.exit(0)
    mesh = make_mesh(STAGES, axis_names=("stage",))
    print(
        f"Pipeline-parallel decoder LM on {jax.devices()[0].platform}: "
        f"{N_LAYERS} layers over {STAGES} stages, {MICRO} microbatches "
        f"(bubble {(STAGES - 1) / (MICRO + STAGES - 1):.0%} per pass)"
    )

    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=VOCAB, d_model=32, n_layers=N_LAYERS, d_ff=64,
        max_len=T,
    )

    def model_fn(p, tokens):
        x = p["embed"][tokens] + p["pos"][:T]
        x = pipeline_blocks(
            stack_blocks(p["blocks"]), x,
            lambda blk, h: _block(blk, h, N_HEADS, causal=True),
            mesh, n_microbatches=MICRO,
        )
        x = _layernorm(p["ln_f"], x)
        return x @ p["embed"].T

    opt = HessianFree(
        params, model_fn=model_fn, loss_outer=next_token_loss,
        damping=1.0, cg_max_iter=20,
    )
    for i in range(6):
        key, kb = jax.random.split(key)
        opt.step(make_batch(kb))
        h = opt.history
        print(
            f"step {i}: loss {h['init_losses'][-1]:.4f} -> "
            f"{h['final_losses'][-1]:.4f} | cg {h['num_cg_iters'][-1]} "
            f"({h['cg_reasons'][-1]})"
        )
    assert opt.history["final_losses"][-1] < (
        0.5 * opt.history["init_losses"][0]
    )
    print("next-token loss halved through the pipelined model; done.")
