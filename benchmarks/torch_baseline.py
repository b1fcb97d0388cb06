"""PyTorch-CPU baseline for the benchmark comparison.

The reference library itself cannot run here (its hard dependency BackPACK is
not installed), so the baseline is a faithful plain-``torch.func``
re-implementation of the same quantities the reference computes:

- the same ResNet-18 architecture (1-channel 7x7 MNIST stem, the model the
  reference benchmarks on -- reference examples/example_utils.py:86-109);
- the GGN-vector product ``Gv = J^T H_L J v`` with the forward linearization
  amortized across matvecs via ``torch.func.linearize`` -- the same
  amortization the reference gets from its retained autograd graph
  (reference optimizer.py:231-233) and BackPACK's
  ``ggn_vector_product_from_plist`` (reference optimizer.py:457-462).

This is the *favorable* CPU baseline (no BackPACK overhead, modern
torch.func); beating it is therefore a conservative claim.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        shortcut = x if self.down is None else self.down(x)
        return F.relu(out + shortcut)


class ResNet18(nn.Module):
    """ResNet-18 with the reference's 1-channel MNIST stem."""

    def __init__(self, num_classes=10, in_channels=1):
        super().__init__()
        self.stem = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(64)
        stages = []
        cin = 64
        for cout, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            stages += [BasicBlock(cin, cout, stride), BasicBlock(cout, cout, 1)]
            cin = cout
        self.stages = nn.Sequential(*stages)
        self.head = nn.Linear(512, num_classes)

    def forward(self, x):
        out = F.relu(self.stem_bn(self.stem(x)))
        out = F.max_pool2d(out, 3, 2, 1)
        out = self.stages(out)
        out = out.mean(dim=(2, 3))
        return self.head(out)


def measure_ggn_matvecs_per_sec(
    batch_size: int = 32, num_matvecs: int = 3, seed: int = 0
) -> float:
    """GGN matvecs/sec through ResNet-18/MNIST on CPU (torch.func)."""
    torch.manual_seed(seed)
    model = ResNet18().eval()  # eval: deterministic, like the reference advises
    x = torch.randn(batch_size, 1, 28, 28)
    y = torch.randint(0, 10, (batch_size,))

    params = dict(model.named_parameters())
    buffers = dict(model.named_buffers())

    def f(p):
        return torch.func.functional_call(model, (p, buffers), (x,))

    # Amortized linearization (the retained-graph analog).
    outputs, jvp_fn = torch.func.linearize(f, params)
    _, vjp_fn = torch.func.vjp(f, params)
    loss_grad = torch.func.grad(lambda o: F.cross_entropy(o, y))

    def gv(v):
        Jv = jvp_fn(v)
        _, HJv = torch.func.jvp(loss_grad, (outputs,), (Jv,))
        return vjp_fn(HJv)[0]

    v = {k: torch.randn_like(p) for k, p in params.items()}
    # warmup
    v = gv(v)

    t0 = time.perf_counter()
    for _ in range(num_matvecs):
        v = gv(v)
        norm = torch.sqrt(sum((t**2).sum() for t in v.values()))
        v = {k: t / norm for k, t in v.items()}
    dt = time.perf_counter() - t0
    return num_matvecs / dt


def measure_hf_step_seconds(
    batch_size: int = 32, cg_iters: int = 30, seed: int = 0
) -> float:
    """Wall-clock of one Hessian-free step's dominant work on CPU: the CG
    loop (cg_iters GGN matvecs + vector updates) plus the gradient and ~8
    trial forward passes (backtracking/line-search budget of a typical step).

    This deliberately under-counts the reference's real per-step cost
    (no damping re-evaluations, no Python/host-sync overhead), again making
    the comparison conservative.
    """
    torch.manual_seed(seed)
    model = ResNet18().eval()
    x = torch.randn(batch_size, 1, 28, 28)
    y = torch.randint(0, 10, (batch_size,))

    params = dict(model.named_parameters())
    buffers = dict(model.named_buffers())

    def f(p):
        return torch.func.functional_call(model, (p, buffers), (x,))

    t0 = time.perf_counter()
    outputs, jvp_fn = torch.func.linearize(f, params)
    _, vjp_fn = torch.func.vjp(f, params)
    loss_grad = torch.func.grad(lambda o: F.cross_entropy(o, y))
    grads = vjp_fn(loss_grad(outputs))[0]

    v = {k: g.clone() for k, g in grads.items()}
    for _ in range(cg_iters):
        Jv = jvp_fn(v)
        _, HJv = torch.func.jvp(loss_grad, (outputs,), (Jv,))
        Gv = vjp_fn(HJv)[0]
        pAp = sum((a * b).sum() for a, b in zip(v.values(), Gv.values()))
        v = {k: t / (pAp.abs().sqrt() + 1e-8) for k, t in Gv.items()}

    with torch.no_grad():
        for _ in range(8):  # trial evaluations (backtracking + line search)
            F.cross_entropy(model(x), y)
    return time.perf_counter() - t0


if __name__ == "__main__":
    rate = measure_ggn_matvecs_per_sec()
    print(f"torch-cpu GGN matvecs/sec: {rate:.3f}")
    sec = measure_hf_step_seconds()
    print(f"torch-cpu HF-step seconds: {sec:.3f}")
