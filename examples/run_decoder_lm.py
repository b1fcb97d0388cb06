"""Hessian-free training of a causal decoder language model.

Next-token cross-entropy over the WHOLE sequence (a softmax GGN block at
every position), through strictly causal attention with the blocks run as
one ``lax.scan`` -- the workload where the sequence axis does real
second-order work, beyond the encoder classifier's single pooled label.
Task: an affine next-token rule tok[t+1] = (a*tok[t] + b) mod V, fully
learnable, init loss ~ ln(V).

Run with `--cpu` anywhere; without it, the step runs on the TPU.
`--chunk N` row-blocks the attention softmax (``attn_chunk``) -- identical
numerics, O(chunk x T) live attention memory: the long-sequence lever
(see BENCH_DETAILS' sequence-scaling section for the measured capacity
extension).
"""

import sys

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    decoder_lm_apply,
    init_decoder_lm,
    next_token_loss,
)

VOCAB, T, BATCH = 32, 16, 32
A, B = 7, 3  # gcd(A, VOCAB) = 1 -> the rule is a permutation


def make_batch(key):
    start = jax.random.randint(key, (BATCH,), 0, VOCAB)
    toks = [start]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens  # loss reads the raw tokens as targets


if __name__ == "__main__":
    attn_chunk = None
    if "--chunk" in sys.argv:
        attn_chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    print(f"Running decoder LM HF on {jax.devices()[0].platform}"
          + (f" (attn_chunk={attn_chunk})" if attn_chunk else ""))
    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=VOCAB, d_model=32, n_layers=2, d_ff=64, max_len=T
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"decoder LM params: {n_params} (tied embedding head), "
          f"init loss ~ ln({VOCAB}) = {float(jnp.log(VOCAB)):.3f}")

    opt = HessianFree(
        params,
        model_fn=lambda p, toks: decoder_lm_apply(
            p, toks, n_heads=4, attn_chunk=attn_chunk
        ),
        loss_outer=next_token_loss,
        damping=1.0,
        cg_max_iter=30,
    )

    for i in range(8):
        key, kb = jax.random.split(key)
        opt.step(make_batch(kb))
        h = opt.history
        print(
            f"step {i}: loss {h['init_losses'][-1]:.4f} -> "
            f"{h['final_losses'][-1]:.4f} | cg {h['num_cg_iters'][-1]} "
            f"({h['cg_reasons'][-1]}) | damping {h['dampings'][-1]:.3f}"
        )

    assert opt.history["final_losses"][-1] < (
        0.5 * opt.history["init_losses"][0]
    )
    print("next-token loss halved; done.")
