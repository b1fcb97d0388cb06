"""Context-parallel Hessian-free training of the causal decoder LM.

The sequence axis of the tokens is sharded over the mesh's ``model`` axis
(``batch_specs=P(None, "model")`` on the sharded step builder): embedding,
layernorm, MLP and the per-position loss partition with zero communication,
and GSPMD inserts the attention k/v all-gathers — the long-context layout
(reference analog: none; the reference is single-GPU).  The CG vector
space shards over the same axis (solver-state sharding), so both the
activations AND the optimizer's working set split across devices.

Run with ``--cpu`` for the virtual 8-device CPU mesh (the conftest-style
environment); on a multi-chip TPU slice the same code shards over ICI.
``--onehot`` switches to the gather-free embedding/loss forms and a fully
2-D (batch x sequence) token sharding — see models._embed for the XLA
partitioner caveat this works around.
"""

import sys

from example_utils import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
)
from pytorchhessianfree_tpu.models import (
    decoder_lm_apply,
    init_decoder_lm,
    next_token_loss,
)
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

VOCAB, T, BATCH = 32, 16, 8
A, B = 7, 3  # affine next-token rule; gcd(A, VOCAB) = 1


def make_batch(key):
    start = jax.random.randint(key, (BATCH,), 0, VOCAB)
    toks = [start]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens


if __name__ == "__main__":
    n_dev = len(jax.devices())
    if n_dev < 2:
        print(f"only {n_dev} device(s); run with --cpu for 8 virtual devices")
        sys.exit(0)
    onehot = "--onehot" in sys.argv

    mesh = make_mesh(n_dev, axis_names=("data", "model"))
    msize = mesh.shape["model"]
    print(
        f"Context-parallel decoder LM on {n_dev} "
        f"{jax.devices()[0].platform} device(s), mesh {dict(mesh.shape)}: "
        f"seq {T} sharded {msize}-way"
        + (" (2-D one-hot layout)" if onehot else "")
    )

    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=VOCAB, d_model=32, n_layers=2, d_ff=64, max_len=T
    )
    fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(
            p, t, n_heads=4, embed_onehot=onehot
        ),
        loss_outer=lambda o, t: next_token_loss(o, t, onehot=onehot),
    )
    config = HFConfig(damping=1.0, cg_max_iter=30)
    ravel = TrainableRavel(params, pad_to_multiple=max(1024, msize))

    # tokens [N, T]: sequence over model; the 2-D one-hot layout also
    # shards the batch over data (the gather form cannot — see _embed)
    spec = P("data", "model") if onehot else P(None, "model")
    step = make_sharded_hf_step(fns, config, ravel, mesh, batch_specs=spec)

    state = init_state(ravel, config)
    first = last = None
    for i in range(6):
        key, kb = jax.random.split(key)
        params, state, stats = step(params, state, make_batch(kb))
        init_l, final_l = float(stats.init_loss), float(stats.final_loss)
        first = init_l if first is None else first
        last = final_l
        print(
            f"step {i}: loss {init_l:.4f} -> {final_l:.4f} | "
            f"cg {int(stats.num_cg_iters)} | "
            f"damping {float(stats.new_damping):.3f}"
        )

    assert last < 0.5 * first
    print("warm-start sharding:", state.x0.sharding.spec)
    print("next-token loss halved under sequence sharding; done.")
