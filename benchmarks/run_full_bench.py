"""Full benchmark sweep on the current default device (TPU when available).

Measures, for the BASELINE.json configs that run on synthetic data:

- GGN matvec throughput on ResNet-18/MNIST b32 (f32 and bf16 curvature);
- full HF-step wall-clock on ResNet-18/MNIST b32 across config variants
  (sequential vs batched backtracking/line-search, f32 vs bf16 curvature);
- full HF-step wall-clock on All-CNN-C/CIFAR-100 b32;

and writes a markdown table to BENCH_DETAILS.md next to this file's parent.

Timing methodology: compile + warm with one batch, then time steps on fresh
batches, forcing completion with a host transfer of a result scalar
(block_until_ready alone can return early through remote-execution relays).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pytorchhessianfree_tpu import (  # noqa: E402
    CGConfig,
    HFConfig,
    HFModelFns,
    LineSearchConfig,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models import (  # noqa: E402
    allcnnc_apply,
    cross_entropy_loss,
    init_allcnnc,
    init_resnet18,
    resnet18_apply,
)

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_DETAILS.md"
)


def _mnist_batch(i, bs=32):
    k = jax.random.PRNGKey(1000 + i)
    kx, ky = jax.random.split(k)
    return (
        jax.random.normal(kx, (bs, 28, 28, 1), jnp.float32),
        jax.random.randint(ky, (bs,), 0, 10),
    )


def _cifar_batch(i, bs=32):
    k = jax.random.PRNGKey(2000 + i)
    kx, ky = jax.random.split(k)
    return (
        jax.random.normal(kx, (bs, 32, 32, 3), jnp.float32),
        jax.random.randint(ky, (bs,), 0, 100),
    )


def time_step(step, params, state, batches):
    """Median wall-clock of `step` over fresh batches (first = warmup)."""
    p, s = params, state
    p, s, stats = step(p, s, batches[0])
    float(stats.final_loss)  # force
    times = []
    for b in batches[1:]:
        t0 = time.perf_counter()
        p, s, stats = step(p, s, b)
        float(stats.final_loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], int(stats.num_cg_iters)


def bench_step(model_kind, mode, curv_dtype, cg_max_iter=50):
    if model_kind == "resnet18":
        params = init_resnet18(jax.random.PRNGKey(0), 10, 1)
        fns = HFModelFns(
            model_fn=resnet18_apply, loss_outer=cross_entropy_loss
        )
        batches = [_mnist_batch(i) for i in range(4)]
    else:
        params = init_allcnnc(jax.random.PRNGKey(0), 100)
        fns = HFModelFns(
            model_fn=allcnnc_apply, loss_outer=cross_entropy_loss
        )
        batches = [_cifar_batch(i) for i in range(4)]

    config = HFConfig(
        damping=1.0,
        cg_max_iter=cg_max_iter,
        backtracking_mode=mode,
        linesearch=LineSearchConfig(mode=mode),
        curvature_dtype=curv_dtype,
    )
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    t_compile0 = time.perf_counter()
    med, cg_iters = time_step(step, params, init_state(ravel, config), batches)
    compile_s = time.perf_counter() - t_compile0 - 3 * med
    return med, cg_iters, compile_s


def matvec_rate(curv_dtype):
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

    params = init_resnet18(jax.random.PRNGKey(0), 10, 1)
    ravel = TrainableRavel(params)
    x, y = _mnist_batch(0)
    K = 50

    def cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(jnp.result_type(a), jnp.floating)
            else a,
            tree,
        )

    @jax.jit
    def chain(params, v0):
        if curv_dtype is None:
            p, xi = params, x
            out_cast = lambda t: t
        else:
            p = cast(params, jnp.dtype(curv_dtype))
            xi = x.astype(jnp.dtype(curv_dtype))
            out_cast = lambda t: t.astype(jnp.float32)
        _, _, _, gv = ggnvp_fn(
            lambda q: out_cast(resnet18_apply(q, xi)),
            lambda o: cross_entropy_loss(o, y),
            p,
        )

        def body(_, v):
            tangent = ravel.unravel(v)
            if curv_dtype is not None:
                tangent = cast(tangent, jnp.dtype(curv_dtype))
            w = ravel.ravel(gv(tangent))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, K, body, v0)

    def fresh(i):
        v = jax.random.normal(jax.random.PRNGKey(i), (ravel.dim,), jnp.float32)
        return v / jnp.linalg.norm(v)

    float(chain(params, fresh(0))[0])
    times = []
    for i in range(1, 4):
        v0 = fresh(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = chain(params, v0)
        float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return K / times[1]


def main(part: str):
    """Parts (each bounded to fit a driver timeout): ``matvec``, ``allcnnc``,
    ``resnet-seq``, ``resnet-bat``.  Results append to a .partial file;
    ``finalize`` assembles BENCH_DETAILS.md."""
    partial = OUT + ".partial"

    def emit(line):
        print(line, flush=True)
        with open(partial, "a") as f:
            f.write(line + "\n")

    if part == "matvec":
        for dt in [None, "bfloat16"]:
            r = matvec_rate(dt)
            emit(f"| matvec {dt or 'float32'} | {r:.1f} matvec/s | | | |")
    elif part == "allcnnc":
        for mode in ["sequential", "batched"]:
            for dt in [None, "bfloat16"]:
                med, cg_iters, comp = bench_step("allcnnc", mode, dt)
                emit(
                    f"| allcnnc | {mode} | {dt or 'float32'} | {med:.3f} | "
                    f"{cg_iters} | {comp:.0f} |"
                )
    elif part in ("resnet-seq", "resnet-bat"):
        mode = "sequential" if part == "resnet-seq" else "batched"
        for dt in [None, "bfloat16"]:
            med, cg_iters, comp = bench_step("resnet18", mode, dt)
            emit(
                f"| resnet18 | {mode} | {dt or 'float32'} | {med:.3f} | "
                f"{cg_iters} | {comp:.0f} |"
            )
    elif part == "finalize":
        dev = jax.devices()[0]
        with open(partial) as f:
            rows = f.read().strip()
        header = "\n".join(
            [
                "# Benchmark details",
                "",
                f"Device: {dev.device_kind} ({dev.platform}); batch 32; "
                "synthetic MNIST/CIFAR-100 shapes; medians of 3 timed runs "
                "after compile; full pipeline with cg_max_iter=50.",
                "",
                "| model / metric | select mode | curvature dtype | step (s) | cg iters | compile (s) |",
                "|---|---|---|---|---|---|",
            ]
        )
        with open(OUT, "w") as f:
            f.write(header + "\n" + rows + "\n")
        print(f"wrote {OUT}")
    else:
        raise SystemExit(f"unknown part {part}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "matvec")
