"""Cross-check FLOP accountings for ResNet-18/MNIST (b32 forward).

Three numbers that should agree (and historically did not):
1. exact hand count of conv/dense MACs x2 from the actual param shapes
   and feature-map sizes;
2. XLA ``cost_analysis()['flops']`` of the jitted forward;
3. the round-2 analytic model (0.48 GFLOP/sample) used in BENCH_DETAILS'
   MFU table.

Whichever of (2) disagrees with (1) tells us how much the compiler's
counter sees through TPU conv custom-calls; (3) vs (1) audits the r2 MFU
claims.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu.models import init_resnet18, resnet18_apply

B = 32
key = jax.random.PRNGKey(0)
params = init_resnet18(key, num_classes=10, in_channels=1)
x = jax.random.normal(key, (B, 28, 28, 1), jnp.float32)


def hand_count():
    """2*MAC flops of every conv + the head, from real shapes."""
    total = 0.0
    spatial = {}

    def conv_flops(hw, kh, kw, cin, cout, stride):
        oh = -(-hw[0] // stride)
        ow = -(-hw[1] // stride)
        return (oh, ow), 2.0 * oh * ow * kh * kw * cin * cout

    hw = (28, 28)
    hw, f = conv_flops(hw, 7, 7, 1, 64, 2)  # stem
    total += f
    hw = (-(-hw[0] // 2), -(-hw[1] // 2))  # maxpool /2
    cin = 64
    for cout, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
        for blk in range(2):
            s = stride if blk == 0 else 1
            hw2, f1 = conv_flops(hw, 3, 3, cin if blk == 0 else cout,
                                 cout, s)
            _, f2 = conv_flops(hw2, 3, 3, cout, cout, 1)
            total += f1 + f2
            if blk == 0 and (s != 1 or cin != cout):
                _, fd = conv_flops(hw, 1, 1, cin, cout, s)
                total += fd
            hw = hw2
        cin = cout
    total += 2.0 * 512 * 10  # head
    return total


per_sample = hand_count()
print(f"hand count: {per_sample:.3e} flops/sample forward "
      f"({B * per_sample:.3e} for b{B})", flush=True)

fwd = jax.jit(lambda p, x: resnet18_apply(p, x))
ca = fwd.lower(params, x).compile().cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"XLA cost_analysis: {float(ca['flops']):.3e} flops for b{B} "
      f"({float(ca['flops']) / B:.3e}/sample) -- ratio vs hand count "
      f"{float(ca['flops']) / (B * per_sample):.2f}x", flush=True)
print(f"r2 analytic model: 4.8e8/sample -- ratio vs hand count "
      f"{4.8e8 / per_sample:.2f}x", flush=True)
