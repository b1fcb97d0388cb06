"""All-CNN-C (Springenberg et al. 2015) in pure JAX (NHWC) for CIFAR-100.

TPU-native analog of the reference's DeepOBS ``cifar100_allcnnc`` workload
(reference examples/example_utils.py:59-83,
examples/run_allcnnc_cifar100_deepobs.py).  The reference runs the model in
``eval()`` mode for deterministic behavior (its dropout layers off,
reference examples/run_allcnnc_cifar100_deepobs.py:23); this implementation
is dropout-free to match that deterministic forward.  The DeepOBS problem's
L2 regularization (``get_regularization_loss``,
reference examples/example_utils.py:76-81) is provided as
:func:`l2_regularizer` to compose into the loss.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .resnet import _conv_init, conv


def init_allcnnc(
    key,
    num_classes: int = 100,
    in_channels: int = 3,
    dtype=jnp.float32,
    width_scale: float = 1.0,
) -> Any:
    """All-CNN-C: three 3-conv blocks (96, 96, 96/2 | 192, 192, 192/2 |
    192-valid, 1x1 192, 1x1 num_classes) + global average pooling.

    ``width_scale`` shrinks the channel widths (same topology) for
    fast-compile smoke/dryrun configurations; 1.0 is the paper/DeepOBS
    model.
    """
    keys = jax.random.split(key, 9)
    c96 = max(1, round(96 * width_scale))
    c192 = max(1, round(192 * width_scale))
    widths = [
        (3, in_channels, c96),
        (3, c96, c96),
        (3, c96, c96),
        (3, c96, c192),
        (3, c192, c192),
        (3, c192, c192),
        (3, c192, c192),
        (1, c192, c192),
        (1, c192, num_classes),
    ]
    convs = []
    for k, (ksz, cin, cout) in zip(keys, widths):
        convs.append(
            {
                "w": _conv_init(k, ksz, ksz, cin, cout, dtype),
                "b": jnp.zeros((cout,), dtype),
            }
        )
    return {"convs": convs}


# (stride, padding) per conv layer; layer 6 uses VALID padding like the paper
_LAYOUT = [
    (1, "SAME"),
    (1, "SAME"),
    (2, "SAME"),
    (1, "SAME"),
    (1, "SAME"),
    (2, "SAME"),
    (1, "VALID"),
    (1, "SAME"),
    (1, "SAME"),
]


def allcnnc_apply(params: Any, x: jax.Array) -> jax.Array:
    """Forward pass.  ``x``: [N, 32, 32, C] NHWC -> [N, num_classes]."""
    for i, (layer, (stride, padding)) in enumerate(
        zip(params["convs"], _LAYOUT)
    ):
        x = conv(x, layer["w"], stride=stride, padding=padding) + layer["b"]
        if i < len(_LAYOUT) - 1:
            x = jax.nn.relu(x)
    return jnp.mean(x, axis=(1, 2))  # global average pool -> logits


def l2_regularizer(params: Any, coeff: float = 5e-4) -> jax.Array:
    """0.5 * coeff * sum ||w||^2 over conv kernels (DeepOBS-style weight
    decay on non-bias params; the reference adds
    ``tproblem.get_regularization_loss()`` to the loss,
    reference examples/example_utils.py:76-81)."""
    sq = sum(jnp.sum(c["w"] ** 2) for c in params["convs"])
    return 0.5 * coeff * sq
