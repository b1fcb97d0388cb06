"""Pure-JAX MLP models for the small-NN workloads.

TPU-native analog of the reference's small test networks
(reference examples/example_utils.py:23-56: a 7 -> 5 -> 5 -> 3 MLP with a
nested Sequential and an optionally frozen first layer + MSELoss).  Models
are (init_fn -> params pytree, apply_fn(params, x)) pairs; no module
framework needed -- parameters are plain pytrees which the optimizer ravels
directly.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp


def _dense_init(key, n_in: int, n_out: int, dtype) -> Dict[str, jax.Array]:
    wk, bk = jax.random.split(key)
    # keep `scale` weak-typed in `dtype`: a strong f32 scalar would promote
    # bf16/f16 params back to f32
    scale = jnp.asarray(1.0 / jnp.sqrt(float(n_in)), dtype)
    return {
        "w": (jax.random.uniform(wk, (n_in, n_out), dtype) * 2 - 1) * scale,
        "b": (jax.random.uniform(bk, (n_out,), dtype) * 2 - 1) * scale,
    }


def init_mlp(
    key,
    sizes: Sequence[int] = (7, 5, 5, 3),
    dtype=jnp.float32,
) -> Any:
    """Initialize MLP params: ``{"layers": [dense, dense, ...]}`` with tanh
    nonlinearities between layers and a linear head."""
    keys = jax.random.split(key, len(sizes) - 1)
    layers = [
        _dense_init(k, sizes[i], sizes[i + 1], dtype)
        for i, k in enumerate(keys)
    ]
    return {"layers": layers}


def mlp_apply(params: Any, x: jax.Array) -> jax.Array:
    layers = params["layers"]
    for layer in layers[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def mlp_dropout_apply(
    params: Any, inputs: Any, rate: float = 0.1
) -> jax.Array:
    """MLP forward with dropout on the hidden activations, PRNG key **in the
    batch**: ``inputs = (x, key)``.

    This is the first-class stochastic-model pattern for HF: the key rides
    in the batch pytree, so every evaluation inside one step -- the
    gradient, every CG curvature matvec, every backtracking/line-search
    trial forward -- sees the SAME dropout masks, and CG's fixed quadratic
    model assumption holds.  Advance the key *between* steps (it's data,
    like the batch itself).  The reference's answer to dropout was to
    disable it ("consider calling model.eval()",
    reference optimizer.py:406-409); fixing the key per step trains the
    stochastic model instead.  A model that instead draws a fresh key per
    forward is exactly what ``check_deterministic(fns_factory=...)``
    flags as ``rng_invariant=False``.
    """
    x, key = inputs
    layers = params["layers"]
    keep = 1.0 - rate
    for i, layer in enumerate(layers[:-1]):
        x = jnp.tanh(x @ layer["w"] + layer["b"])
        mask = jax.random.bernoulli(
            jax.random.fold_in(key, i), keep, x.shape
        )
        x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    return x @ layers[-1]["w"] + layers[-1]["b"]


def mse_loss(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    """MSELoss with mean reduction (the reference's default loss for the
    small-NN problems, reference tests/test_utils.py:46)."""
    return jnp.mean((outputs - targets) ** 2)


def mse_loss_sum(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.sum((outputs - targets) ** 2)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Softmax cross-entropy with integer labels, mean reduction
    (torch.nn.CrossEntropyLoss analog)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def cross_entropy_loss_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def mse_per_sample(outputs: jax.Array, targets: jax.Array) -> jax.Array:
    """[N] per-sample MSE (mean over feature dims), such that the uniform
    mean over samples equals :func:`mse_loss`."""
    axes = tuple(range(1, outputs.ndim))
    return jnp.mean((outputs - targets) ** 2, axis=axes)


def cross_entropy_per_sample(
    logits: jax.Array, labels: jax.Array
) -> jax.Array:
    """[N] per-sample softmax cross-entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def freeze_first_layer(params: Any) -> Any:
    """Trainable mask with layer 0 frozen -- the reference's
    ``freeze_layer1`` test knob (reference tests/test_utils.py:40-43)."""
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["layers"][0] = jax.tree_util.tree_map(
        lambda _: False, mask["layers"][0]
    )
    return mask
