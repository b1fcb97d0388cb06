"""Hessian-free training of a flax.linen module (the interop on-ramp).

The reference takes any ``torch.nn.Module`` + loss closure (reference
optimizer.py:126-154); the analog here is any ``(params, inputs)`` callable,
and ``interop.flax_fns`` supplies it for flax modules with the two hard
cases wired correctly:

- BatchNorm running statistics (a non-param collection) ride IN THE BATCH
  (``state_in_batch=True``): frozen inside each step (CG's determinism
  contract -- the principled version of the reference's "call model.eval()"
  advice), refreshed between steps with ``flax_state_update`` WITHOUT
  retracing the compiled step program.
- Dropout draws its PRNG key from the batch too (``rngs=("dropout",)``):
  one key per step, so the gradient, every CG matvec and every trial
  forward see the same masks; the key advances between steps like data.

Run with `--cpu` anywhere; without it, the step runs on the TPU.
"""

import jax
import jax.numpy as jnp
from example_utils import force_cpu_if_requested

force_cpu_if_requested()

import flax.linen as nn  # noqa: E402

from pytorchhessianfree_tpu import (  # noqa: E402
    HessianFree,
    flax_fns,
    flax_state_update,
    split_flax_variables,
)
from pytorchhessianfree_tpu.models import cross_entropy_loss  # noqa: E402

BATCH, D_IN, CLASSES = 64, 20, 4


class Net(nn.Module):
    """MLP with BatchNorm (non-param state) and dropout (PRNG collection)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(32)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.tanh(x)
        x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return nn.Dense(CLASSES)(x)


def make_batch(key):
    kx, kn = jax.random.split(key)
    labels = jax.random.randint(kx, (BATCH,), 0, CLASSES)
    centers = jax.random.normal(
        jax.random.PRNGKey(42), (CLASSES, D_IN), jnp.float32
    )
    x = centers[labels] + 0.3 * jax.random.normal(
        kn, (BATCH, D_IN), jnp.float32
    )
    return x, labels


if __name__ == "__main__":
    print(f"Running flax interop HF on {jax.devices()[0].platform}")
    net = Net()
    key = jax.random.PRNGKey(0)
    x0, _ = make_batch(jax.random.fold_in(key, 99))
    variables = net.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        x0,
        train=True,
    )
    params, bn_state = split_flax_variables(variables)
    print(f"collections: params + {sorted(bn_state.keys())}")

    # state AND dropout key ride in the batch: inputs = (x, key, state)
    fns = flax_fns(
        net, cross_entropy_loss, state_in_batch=True, rngs=("dropout",)
    )
    opt = HessianFree(
        params,
        model_fn=fns.model_fn,
        loss_outer=fns.loss_outer,
        damping=1.0,
        cg_max_iter=30,
    )

    for i in range(6):
        key, kb, kd = jax.random.split(key, 3)
        x, y = make_batch(kb)
        opt.step(((x, kd, bn_state), y))
        # refresh the running statistics BETWEEN steps (train-mode forward);
        # the compiled step program is reused -- the state is batch data
        bn_state = flax_state_update(
            net,
            opt.params,
            bn_state,
            x,
            rngs={"dropout": jax.random.fold_in(kd, 1)},
            apply_kwargs={"train": True},
        )
        h = opt.history
        print(
            f"step {i}: loss {h['init_losses'][-1]:.4f} -> "
            f"{h['final_losses'][-1]:.4f} | cg {h['num_cg_iters'][-1]} "
            f"({h['cg_reasons'][-1]}) | damping {h['dampings'][-1]:.3f}"
        )

    assert opt.history["init_losses"][-1] < opt.history["init_losses"][0]
    mean_leaf = jax.tree_util.tree_leaves(bn_state["batch_stats"])[0]
    assert float(jnp.sum(jnp.abs(mean_leaf))) > 0.0
    print("loss decreased; BatchNorm statistics tracked; done.")
