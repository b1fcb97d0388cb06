"""Model-family tests: shapes, determinism, trainability with the optimizer
at tiny sizes (the reference's model zoo is torchvision/DeepOBS-provided;
ours is in-repo and needs its own coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    allcnnc_apply,
    cross_entropy_loss,
    init_allcnnc,
    init_resnet18,
    l2_regularizer,
    resnet18_apply,
)


def test_resnet18_shapes_and_param_count():
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    n = sum(a.size for a in jax.tree_util.tree_leaves(params))
    # torchvision resnet18(num_classes=10) with a 1-channel 7x7 stem has
    # 11,175,370 params (conv/bn/fc); architecture parity check.
    assert n == 11_175_370
    x = jax.random.normal(key, (2, 28, 28, 1), jnp.float32)
    out = resnet18_apply(params, x)
    assert out.shape == (2, 10)
    # deterministic forward (pure batch-stats BN)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(resnet18_apply(params, x))
    )


def test_allcnnc_shapes():
    key = jax.random.PRNGKey(0)
    params = init_allcnnc(key, num_classes=100)
    x = jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
    out = allcnnc_apply(params, x)
    assert out.shape == (2, 100)
    reg = float(l2_regularizer(params))
    assert reg > 0


def test_transformer_trains_with_hf():
    """GGN through softmax attention + layernorm: a compact transformer
    classifier must learn a synthetic token rule under the full HF pipeline
    (a model family beyond the reference's MLP/CNN zoo)."""
    import functools

    from pytorchhessianfree_tpu.models import (
        init_transformer,
        transformer_apply,
    )

    key = jax.random.PRNGKey(0)
    params = init_transformer(key)
    tokens = jax.random.randint(key, (16, 12), 0, 64)
    labels = tokens.sum(axis=1) % 4  # learnable rule

    opt = HessianFree(
        params,
        model_fn=functools.partial(transformer_apply, n_heads=4),
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=30,
    )
    losses = [opt.step((tokens, labels)) for _ in range(5)]
    assert losses[-1] < 0.2 * opt.history["init_losses"][0]
    assert all(np.isfinite(v) for v in losses)


def test_tiny_convnet_trains_with_hf():
    """A reduced All-CNN-C-style net must decrease its loss under the full HF
    pipeline -- the 'one conv model running end-to-end' smoke for CI."""
    key = jax.random.PRNGKey(0)
    # tiny variant: override widths by building a resnet-free small conv net
    from pytorchhessianfree_tpu.models.resnet import _conv_init, conv

    k1, k2 = jax.random.split(key)
    params = {
        "c1": _conv_init(k1, 3, 3, 1, 8, jnp.float32),
        "c2": _conv_init(k2, 3, 3, 8, 4, jnp.float32),
    }

    def model_fn(p, x):
        h = jax.nn.relu(conv(x, p["c1"], stride=2))
        h = conv(h, p["c2"], stride=1)
        return jnp.mean(h, axis=(1, 2))

    opt = HessianFree(
        params,
        model_fn=model_fn,
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=20,
    )
    x = jax.random.normal(key, (8, 8, 8, 1), jnp.float32)
    y = jax.random.randint(key, (8,), 0, 4)
    losses = [opt.step((x, y)) for _ in range(3)]
    assert opt.history["init_losses"][0] > opt.history["init_losses"][-1]
    assert all(np.isfinite(v) for v in losses)


def test_resnet18_width_scale():
    """width_scale shrinks every channel (same topology); forward shapes
    hold because the apply reads all shapes from the params."""
    from pytorchhessianfree_tpu.models import init_resnet18, resnet18_apply

    key = jax.random.PRNGKey(0)
    tiny = init_resnet18(key, num_classes=10, in_channels=1,
                         width_scale=0.125)
    full = init_resnet18(key, num_classes=10, in_channels=1)
    n_tiny = sum(a.size for a in jax.tree_util.tree_leaves(tiny))
    n_full = sum(a.size for a in jax.tree_util.tree_leaves(full))
    assert n_tiny < n_full / 20
    assert tiny["stem"].shape[-1] == 8  # 64 * 0.125
    x = jax.random.normal(key, (2, 28, 28, 1), jnp.float32)
    out = resnet18_apply(tiny, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
