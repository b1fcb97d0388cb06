"""Hessian-free training of a Mixture-of-Experts causal decoder LM.

Top-2 routed experts with per-expert capacity (GShard-style einsum
dispatch, models/moe.py) -- the sparse-expert member of the model zoo (no
reference analog).  HF needs nothing special: routing is deterministic
given (params, batch) and the top-k masks are piecewise-constant, so the
GGN's jvp/vjp flow through the gate probabilities and expert MLPs and
CG's fixed-quadratic assumption holds.

The Switch load-balance auxiliary loss rides through ``return_aux=True``
and a composing ``loss_outer`` -- the GGN treats it as one more output
block.  Run with ``--cpu`` anywhere; without it, the step runs on the TPU.
``--ep`` additionally runs EXPERT-PARALLEL: the expert weight stacks
shard over the mesh's model axis (``moe_param_specs``) through the
sharded wrapper (needs >= 2 devices; ``--cpu`` provides 8 virtual ones).
"""

import sys

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    init_moe_decoder_lm,
    moe_decoder_lm_apply,
    next_token_loss,
)

VOCAB, T, BATCH = 32, 16, 32
N_EXPERTS, AUX_WEIGHT = 4, 0.01
A, B = 7, 3  # affine next-token rule; gcd(A, VOCAB) = 1


def make_batch(key):
    start = jax.random.randint(key, (BATCH,), 0, VOCAB)
    toks = [start]
    for _ in range(T - 1):
        toks.append((A * toks[-1] + B) % VOCAB)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)
    return tokens, tokens


if __name__ == "__main__":
    top_k = 1 if "--top1" in sys.argv else 2
    groups = (int(sys.argv[sys.argv.index("--groups") + 1])
              if "--groups" in sys.argv else 1)
    print(
        f"Running MoE decoder LM HF on {jax.devices()[0].platform} "
        f"(top-{top_k} routing, {groups} router group(s))"
    )
    key = jax.random.PRNGKey(0)
    params = init_moe_decoder_lm(
        key, vocab=VOCAB, d_model=32, n_layers=2, d_ff=64,
        n_experts=N_EXPERTS, max_len=T,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    n_expert = sum(
        blk[k].size for blk in params["blocks"]
        for k in ("w1", "b1", "w2", "b2")
    )
    print(
        f"MoE decoder params: {n_params} ({n_expert} in {N_EXPERTS} experts"
        f" x {len(params['blocks'])} layers, top-2 routed)"
    )

    mesh_kw = {}
    if "--ep" in sys.argv:
        from pytorchhessianfree_tpu.models import moe_param_specs
        from pytorchhessianfree_tpu.parallel.mesh import make_mesh

        n_dev = jax.device_count()
        if n_dev < 2:
            raise SystemExit(
                "--ep needs >= 2 devices (use --cpu for 8 virtual ones)"
            )
        mesh = make_mesh(n_dev, axis_names=("data", "model"))
        mesh_kw = dict(
            mesh=mesh, param_specs=moe_param_specs(len(params["blocks"]))
        )
        print(
            f"expert-parallel: experts sharded "
            f"{mesh.shape['model']}-way over the model axis "
            f"(mesh {dict(mesh.shape)})"
        )

    opt = HessianFree(
        params,
        model_fn=lambda p, t: moe_decoder_lm_apply(
            p, t, return_aux=True, top_k=top_k, router_groups=groups
        ),
        loss_outer=lambda out, t: next_token_loss(out[0], t)
        + AUX_WEIGHT * out[1],
        damping=1.0,
        cg_max_iter=30,
        **mesh_kw,
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
    # balanced routing: the aux loss at the trained params should be near
    # its optimum E * sum(1/E * 1/E) = 1 for uniform routing
    _, aux = moe_decoder_lm_apply(
        opt.params, make_batch(key)[0], return_aux=True, top_k=top_k,
        router_groups=groups,
    )
    print(f"load-balance aux at trained params: {float(aux):.3f} "
          "(1.0 = perfectly uniform)")
    print("next-token loss halved through routed experts; done.")
