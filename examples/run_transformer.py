"""Hessian-free training of a Transformer encoder classifier.

Beyond the reference's model zoo (MLPs and CNNs only,
reference examples/): the same HF pipeline -- GGN through softmax attention
and layernorm, PCG with Martens' criterion, LM damping, CG-backtracking,
Armijo line search -- trains an attention model unchanged.  The task is a
learnable synthetic one (classify a sequence by which token dominates it),
so the loss visibly drops in a few steps.

Run with `--cpu` anywhere; without it, the step runs on the TPU.
"""

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import cross_entropy_loss
from pytorchhessianfree_tpu.models.transformer import (
    init_transformer,
    transformer_apply,
)

VOCAB, T, CLASSES, BATCH = 16, 12, 4, 64


def make_batch(key):
    """Sequences whose label is the majority token class (token // 4)."""
    kt, kl = jax.random.split(key)
    labels = jax.random.randint(kl, (BATCH,), 0, CLASSES)
    # bias each sequence's tokens toward its label's token group
    base = jax.random.randint(kt, (BATCH, T), 0, VOCAB)
    biased = labels[:, None] * 4 + jax.random.randint(
        jax.random.fold_in(kt, 1), (BATCH, T), 0, 4
    )
    mask = jax.random.bernoulli(jax.random.fold_in(kt, 2), 0.7, (BATCH, T))
    tokens = jnp.where(mask, biased, base)
    return tokens.astype(jnp.int32), labels


if __name__ == "__main__":
    print(f"Running transformer HF on {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    params = init_transformer(
        key, vocab=VOCAB, num_classes=CLASSES, max_len=T
    )
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(params)
    )
    print(f"transformer params: {n_params}")

    opt = HessianFree(
        params,
        model_fn=lambda p, x: transformer_apply(p, x),
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=30,
    )

    for i in range(6):
        key, kb = jax.random.split(key)
        batch = make_batch(kb)
        opt.step(batch)
        h = opt.history
        print(
            f"step {i}: loss {h['init_losses'][-1]:.4f} -> "
            f"{h['final_losses'][-1]:.4f} | cg {h['num_cg_iters'][-1]} "
            f"({h['cg_reasons'][-1]}) | damping {h['dampings'][-1]:.3f}"
        )

    assert opt.history["init_losses"][-1] < opt.history["init_losses"][0]
    print("loss decreased; done.")
