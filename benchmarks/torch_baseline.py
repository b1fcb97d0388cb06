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


# ---------------------------------------------------------------------------
# Full reference-semantics HF step (the honest per-step baseline)
# ---------------------------------------------------------------------------
#
# ``measure_hf_step_seconds`` above is a *lower bound* proxy (fixed matvec
# count, no solver logic).  The functions below implement the reference's
# COMPLETE step semantics in torch on CPU so that wall-clock per HF step can
# be compared A/B rather than extrapolated:
#   gradient (amortized linearization) -> damped PCG with Martens'
#   relative-progress criterion, 1.3^j storage grid and tol-based residual
#   exit (reference cg.py:80-170) -> x0 warm-start decay -> LM damping
#   adaptation with f_0 at the warm start (reference optimizer.py:464-506)
#   -> efficient CG backtracking, reverse walk with first-non-improvement
#   exit (reference cg_backtracking.py:53-112) -> Armijo line search with
#   alpha-decay 0.8, c=1e-2, <=20 trials (reference linesearch.py:8-103)
#   -> parameter update.
# Semantics are pinned by the same rules as the NumPy replica in
# tests/test_cross_framework.py (which itself is trajectory-checked against
# the JAX implementation).  torch.func.linearize gives the reference's
# retained-graph matvec amortization (optimizer.py:231-233); this remains
# the *favorable* CPU baseline (no BackPACK overhead, no per-iteration
# Python dispatch beyond what torch requires).


def _flat(tree):
    return torch.cat([t.reshape(-1) for t in tree.values()])


def _unflat(vec, template):
    out, off = {}, 0
    for k, t in template.items():
        n = t.numel()
        out[k] = vec[off : off + n].reshape(t.shape)
        off += n
    return out


def _storage_grid(max_iter):
    import math

    grid = {0}
    j = 0
    while True:
        g = int(math.ceil(1.3**j) - 1)
        if g > max_iter:
            break
        grid.add(g)
        j += 1
    return grid


def _torch_cg(A, b, x0, max_iter, tol=1e-5):
    """Reference-semantics PCG (no preconditioner, the flagship default):
    Martens window k=max(10, it//10) threshold 5e-4, residual exit
    ||r|| < tol*||b||, iterates stored on the ceil(1.3^j)-1 grid."""
    grid = _storage_grid(max_iter)
    res_bound = tol * torch.linalg.vector_norm(b)
    x = x0.clone()
    stored = {0: x.clone()} if 0 in grid else {}
    r = A(x) - b
    m_hist = [0.5 * torch.dot(r - b, x)]
    ry = torch.dot(r, r)
    p = -r
    it = 1
    while True:
        Ap = A(p)
        pAp = torch.dot(p, Ap)
        alpha = ry / pAp
        x = x + alpha * p
        if it in grid:
            stored[it] = x.clone()
        r = r + alpha * Ap
        m_hist.append(0.5 * torch.dot(r - b, x))
        k = max(10, it // 10)
        if (
            k < it
            and (m_hist[it] - m_hist[it - k]) / (m_hist[it] - m_hist[0])
            < 5e-4
        ):
            break
        if it >= max_iter:
            break
        rnorm = torch.linalg.vector_norm(r)
        if torch.isnan(rnorm) or rnorm < res_bound:
            break
        ry_new = torch.dot(r, r)
        beta = ry_new / ry
        ry = ry_new
        p = -r + beta * p
        it += 1
    return x, stored, m_hist, it


class AllCNNC(nn.Module):
    """All-CNN-C for CIFAR-100 (Springenberg et al. 2015): the reference's
    DeepOBS flagship (reference examples/run_allcnnc_cifar100_deepobs.py),
    dropout-free like its eval() mode.  Layer 6 uses VALID padding."""

    _LAYOUT = [  # (ksz, cin, cout, stride, pad)
        (3, 3, 96, 1, 1), (3, 96, 96, 1, 1), (3, 96, 96, 2, 1),
        (3, 96, 192, 1, 1), (3, 192, 192, 1, 1), (3, 192, 192, 2, 1),
        (3, 192, 192, 1, 0), (1, 192, 192, 1, 0),
    ]

    def __init__(self, num_classes=100):
        super().__init__()
        layers = []
        for k, cin, cout, s, p in self._LAYOUT:
            layers += [nn.Conv2d(cin, cout, k, s, p), nn.ReLU()]
        layers += [nn.Conv2d(192, num_classes, 1, 1, 0)]
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


def allcnnc_l2(params, coeff=5e-4):
    """0.5 * coeff * sum ||w||^2 over conv kernels (DeepOBS weight decay,
    reference examples/example_utils.py:76-81)."""
    return 0.5 * coeff * sum(
        (v**2).sum() for k, v in params.items() if "weight" in k
    )


def reference_hf_step(model, x, y, params, x0, damping, cg_max_iter=50,
                      reg=None):
    """One full reference-semantics HF step (GGN curvature) in torch on CPU.

    ``reg(params) -> scalar``: optional params-only regularizer -- enters
    the loss, the gradient and every trial evaluation, NOT the GGN (the
    reference's behavior with a regularized forward closure).

    Returns ``(new_params, new_x0, new_damping, num_cg_iters)``.
    """
    buffers = dict(model.named_buffers())

    def f(p):
        return torch.func.functional_call(model, (p, buffers), (x,))

    # gradient + amortized GGN matvec (retained-graph analog)
    outputs, jvp_fn = torch.func.linearize(f, params)
    _, vjp_fn = torch.func.vjp(f, params)
    loss_grad = torch.func.grad(lambda o: F.cross_entropy(o, y))
    init_loss = float(F.cross_entropy(outputs, y))
    grad = _flat(vjp_fn(loss_grad(outputs))[0]).detach()
    if reg is not None:
        init_loss += float(reg(params))
        grad = grad + _flat(torch.func.grad(reg)(params)).detach()

    def gv_flat(v):
        Jv = jvp_fn(_unflat(v, params))
        _, HJv = torch.func.jvp(loss_grad, (outputs,), (Jv,))
        return _flat(vjp_fn(HJv)[0]).detach()

    def A(v):
        return gv_flat(v) + damping * v

    x_final, stored, m_hist, final_iter = _torch_cg(
        A, -grad, x0, cg_max_iter
    )
    new_x0 = 0.95 * x_final

    params_flat = _flat(params).detach()

    @torch.no_grad()
    def tfunc(delta):
        trial = _unflat(params_flat + delta, params)
        val = float(
            F.cross_entropy(
                torch.func.functional_call(model, (trial, buffers), (x,)), y
            )
        )
        if reg is not None:
            val += float(reg(trial))
        return val

    # LM damping adaptation (f_0 at the warm start, reference optimizer.py:302)
    f_0 = tfunc(x0)
    f_step = tfunc(x_final)
    rho = (f_step - f_0) / float(m_hist[final_iter] - m_hist[0])
    if rho < 0.25:
        damping *= 3 / 2
    elif rho > 0.75:
        damping *= 2 / 3

    # efficient backtracking: reverse walk, stop at first non-improvement
    f_min, best = float("inf"), x_final
    cands = [(final_iter, x_final)] + [
        (i, v) for i, v in sorted(stored.items(), reverse=True)
        if i < final_iter
    ]
    for _, vec in cands:
        fv = tfunc(vec)
        if fv < f_min:
            f_min, best = fv, vec
        else:
            break

    # Armijo line search (init_alpha=lr=1.0, beta=0.8, c=1e-2, <=20 trials)
    c_dir = 1e-2 * torch.dot(grad, best)
    alpha = 1.0
    fa = tfunc(alpha * best)
    for _ in range(20):
        if fa <= init_loss + alpha * float(c_dir):
            break
        alpha *= 0.8
        fa = tfunc(alpha * best)
    else:
        alpha = 0.0

    new_params = {
        k: v.clone()
        for k, v in _unflat(params_flat + alpha * best, params).items()
    }
    return new_params, new_x0, damping, final_iter


def measure_reference_hf_step_seconds(
    batch_size: int = 32, cg_max_iter: int = 50, num_steps: int = 3,
    seed: int = 0, model_name: str = "resnet18",
):
    """Median wall-clock of a full reference-semantics HF step on CPU,
    measured over ``num_steps`` consecutive steps after one warmup step
    (so the warm start and adapted damping are in their steady regime,
    like the JAX-side step benches).

    ``model_name``: "resnet18" (MNIST stem, plain CE) or "allcnnc"
    (CIFAR-100 shapes, L2-regularized CE -- the reference's DeepOBS
    flagship configuration).

    Returns ``(median_seconds, [cg_iters per timed step])``.
    """
    torch.manual_seed(seed)
    if model_name == "allcnnc":
        model = AllCNNC().eval()
        x = torch.randn(batch_size, 3, 32, 32)
        y = torch.randint(0, 100, (batch_size,))
        reg = allcnnc_l2
    else:
        model = ResNet18().eval()
        x = torch.randn(batch_size, 1, 28, 28)
        y = torch.randint(0, 10, (batch_size,))
        reg = None

    params = {
        k: v.detach().clone() for k, v in model.named_parameters()
    }
    n = sum(p.numel() for p in params.values())
    x0 = torch.zeros(n)
    damping = 1.0

    params, x0, damping, _ = reference_hf_step(
        model, x, y, params, x0, damping, cg_max_iter, reg=reg
    )  # warmup step

    times, iters = [], []
    for _ in range(num_steps):
        t0 = time.perf_counter()
        params, x0, damping, its = reference_hf_step(
            model, x, y, params, x0, damping, cg_max_iter, reg=reg
        )
        times.append(time.perf_counter() - t0)
        iters.append(its)
    times.sort()
    return times[len(times) // 2], iters


if __name__ == "__main__":
    rate = measure_ggn_matvecs_per_sec()
    print(f"torch-cpu GGN matvecs/sec: {rate:.3f}")
    sec = measure_hf_step_seconds()
    print(f"torch-cpu HF-step-proxy seconds: {sec:.3f}")
    full, iters = measure_reference_hf_step_seconds()
    print(f"torch-cpu full reference HF step: {full:.3f}s (cg iters {iters})")
