"""ResNet-18 in pure JAX (NHWC), for the MNIST workload.

TPU-native analog of the reference's torchvision ``resnet18`` with a
1-channel 7x7 stem for MNIST (reference examples/example_utils.py:86-109,
examples/run_resnet18_mnist.py).  Built NHWC (the TPU-preferred layout) with
``lax.conv_general_dilated`` so XLA tiles the convolutions onto the MXU.

BatchNorm is a *pure batch-statistics* normalization: deterministic given
``(params, batch)``, which is exactly what Hessian-free needs -- CG's
quadratic model assumes a fixed deterministic forward (the reference warns
about stochastic models via its determinism self-test,
reference optimizer.py:365-448).  No running statistics are mutated (a pure
function cannot); for inference-style normalization pass explicit ``stats``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    std = jnp.sqrt(jnp.asarray(2.0 / fan_in, jnp.float32))
    return (jax.random.normal(key, (kh, kw, cin, cout), dtype) * std).astype(
        dtype
    )


def conv(x: jax.Array, w: jax.Array, stride: int = 1, padding="SAME"):
    # For f32 operands, request an f32 output explicitly.  For reduced
    # precision (bf16) leave preferred_element_type unset: the TPU MXU
    # accumulates bf16 products in f32 internally either way, and a mixed
    # f32-output/bf16-operand conv has no valid transpose (its VJP would
    # pair a bf16 primal with an f32 cotangent).
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    ).astype(x.dtype)


def batchnorm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """Pure batch-stats normalization over (N, H, W)."""
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + _BN_EPS)
    return (x - mean) * inv * scale + bias


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def max_pool(x: jax.Array, window: int = 3, stride: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _block_init(key, cin, cout, stride, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
        "bn1": _bn_init(cout, dtype),
        "conv2": _conv_init(k2, 3, 3, cout, cout, dtype),
        "bn2": _bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = _conv_init(k3, 1, 1, cin, cout, dtype)
        p["down_bn"] = _bn_init(cout, dtype)
    return p


def _block_apply(p, x, stride):
    out = conv(x, p["conv1"], stride)
    out = jax.nn.relu(batchnorm(out, p["bn1"]["scale"], p["bn1"]["bias"]))
    out = conv(out, p["conv2"], 1)
    out = batchnorm(out, p["bn2"]["scale"], p["bn2"]["bias"])
    if "down_conv" in p:
        x = batchnorm(
            conv(x, p["down_conv"], stride),
            p["down_bn"]["scale"],
            p["down_bn"]["bias"],
        )
    return jax.nn.relu(out + x)


_STAGES = ((64, 1), (128, 2), (256, 2), (512, 2))  # (channels, first stride)


def init_resnet18(
    key,
    num_classes: int = 10,
    in_channels: int = 1,
    dtype=jnp.float32,
    width_scale: float = 1.0,
) -> Any:
    """Parameters for ResNet-18: 7x7/2 stem (``in_channels=1`` matches the
    reference's MNIST surgery, reference examples/example_utils.py:93-95),
    3x3/2 maxpool, four stages of two basic blocks, global average pool,
    linear head.

    ``width_scale`` shrinks every channel width (same topology; the apply
    reads all shapes from the params), for CI-speed / dryrun configs."""
    keys = jax.random.split(key, 11)

    def w(c):
        return max(1, round(c * width_scale))

    params = {
        "stem": _conv_init(keys[0], 7, 7, in_channels, w(64), dtype),
        "stem_bn": _bn_init(w(64), dtype),
        "stages": [],
        "head": {
            "w": jax.random.normal(keys[1], (w(512), num_classes), dtype)
            / jnp.sqrt(jnp.asarray(float(w(512)), dtype)),
            "b": jnp.zeros((num_classes,), dtype),
        },
    }
    cin = w(64)
    ki = 2
    for cout, stride in _STAGES:
        blocks = [
            _block_init(keys[ki], cin, w(cout), stride, dtype),
            _block_init(keys[ki + 1], w(cout), w(cout), 1, dtype),
        ]
        params["stages"].append(blocks)
        cin = w(cout)
        ki += 2
    return params


def resnet18_apply(params: Any, x: jax.Array) -> jax.Array:
    """Forward pass.  ``x``: [N, H, W, C] (NHWC)."""
    out = conv(x, params["stem"], stride=2)
    out = jax.nn.relu(
        batchnorm(out, params["stem_bn"]["scale"], params["stem_bn"]["bias"])
    )
    out = max_pool(out, 3, 2)
    for blocks, (cout, stride) in zip(params["stages"], _STAGES):
        out = _block_apply(blocks[0], out, stride)
        out = _block_apply(blocks[1], out, 1)
    out = jnp.mean(out, axis=(1, 2))  # global average pool
    return out @ params["head"]["w"] + params["head"]["b"]
