"""Driver benchmark: GGN matvec throughput on the flagship workload.

Measures GGN-vector products/sec through ResNet-18 (1-channel MNIST stem,
batch 32) -- the hot op of Hessian-free optimization (every CG iteration is
one curvature matvec, reference cg.py:205) and the driver-assigned headline
metric (BASELINE.json: "GGN matvecs/sec + wall-clock per HF step").

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over the PyTorch-CPU baseline
(benchmarks/torch_baseline.py -- a plain torch.func reimplementation of the
same amortized-linearization GGN matvec, since the reference's BackPACK
dependency is not installed here).  The CPU number is measured once and
cached in BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH_SIZE = 32
NUM_MATVECS = 50  # chained matvecs per timed call
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")


def measure_jax_matvecs_per_sec() -> dict:
    """Returns rate quantiles over the in-process repeats:
    ``{"median", "q1", "q3", "min", "max", "n", "iqr_pct"}`` (matvec/s)."""
    from pytorchhessianfree_tpu import TrainableRavel
    from pytorchhessianfree_tpu.models import (
        cross_entropy_loss,
        init_resnet18,
        resnet18_apply,
    )
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (BATCH_SIZE, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (BATCH_SIZE,), 0, 10)

    @jax.jit
    def chain(params, x, y, v0):
        """NUM_MATVECS chained, normalized GGN matvecs in one XLA program:
        linearize once (amortized across the chain, like one HF step's CG
        loop), then fori_loop the matvec."""
        _, _, _, gv = ggnvp_fn(
            lambda p: resnet18_apply(p, x),
            lambda o: cross_entropy_loss(o, y),
            params,
        )

        def body(_, v):
            w = ravel.ravel(gv(ravel.unravel(v)))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

    def fresh_v(i):
        v = jax.random.normal(jax.random.PRNGKey(100 + i), (ravel.dim,),
                              jnp.float32)
        return v / jnp.linalg.norm(v)

    float(chain(params, x, y, fresh_v(0))[0])  # compile + warmup
    # Median + spread over MANY timed calls, each with a DISTINCT v0, each
    # forced to completion by a host transfer of a result element
    # (block_until_ready alone has been observed to return early through
    # remote-execution relays, yielding microsecond-scale phantom timings).
    # The remote relay's run latency is bimodal (BENCH_DETAILS: ~2x swings
    # between service phases); 15 repeats with an IQR dispersion field make
    # a phase swing visible as spread instead of silently moving the
    # point estimate (the r02->r03 -8.7% "regression" was this noise).
    times = []
    for i in range(1, 16):
        v0 = fresh_v(i)
        jax.block_until_ready(v0)
        t0 = time.perf_counter()
        out = chain(params, x, y, v0)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    median = times[n // 2]
    q1, q3 = times[n // 4], times[(3 * n) // 4]
    rates = {
        "median": NUM_MATVECS / median,
        # rate quartiles: fast time -> high rate, so q1 of time is q3 of rate
        "q1": NUM_MATVECS / q3,
        "q3": NUM_MATVECS / q1,
        "min": NUM_MATVECS / times[-1],
        "max": NUM_MATVECS / times[0],
        "n": n,
    }
    rates["iqr_pct"] = round(
        100.0 * (rates["q3"] - rates["q1"]) / rates["median"], 1
    )
    return rates


def measure_jax_hf_step_seconds(cg_max_iter: int = 50):
    """Median wall-clock of the FULL jitted HF step (gradient -> damped PCG
    with Martens criterion -> LM damping -> CG backtracking -> Armijo line
    search -> update) on the same ResNet-18/MNIST b32 problem, state advanced
    across steps like a real training loop.

    Returns ``(median_seconds, [cg iters per timed step])``.
    """
    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_step,
    )
    from pytorchhessianfree_tpu.models import (
        cross_entropy_loss,
        init_resnet18,
        resnet18_apply,
    )

    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    fns = HFModelFns(model_fn=resnet18_apply,
                     loss_outer=cross_entropy_loss)
    config = HFConfig(damping=1.0, cg_max_iter=cg_max_iter)
    step = make_hf_step(fns, config, ravel)

    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (BATCH_SIZE, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (BATCH_SIZE,), 0, 10)
    batch = (x, y)

    state = init_state(ravel, config)
    params, state, stats = step(params, state, batch)  # compile + warmup step
    _ = float(stats.final_loss)

    times, iters = [], []
    for _ in range(7):
        t0 = time.perf_counter()
        params, state, stats = step(params, state, batch)
        _ = float(stats.final_loss)  # force completion via host transfer
        times.append(time.perf_counter() - t0)
        iters.append(int(stats.num_cg_iters))
    ts = sorted(times)
    spread_pct = round(
        100.0 * (ts[(3 * len(ts)) // 4] - ts[len(ts) // 4])
        / ts[len(ts) // 2], 1,
    )
    # raw step spread mostly reflects the CG-iteration count decaying as LM
    # damping adapts (42 -> ~20 over these 7 steps), not relay noise; the
    # per-CG-iteration cost is the stable quantity, so report it too.
    per_iter = sorted(
        t / max(i, 1) for t, i in zip(times, iters)
    )
    per_iter_ms = round(per_iter[len(per_iter) // 2] * 1e3, 3)
    return ts[len(ts) // 2], iters, spread_pct, per_iter_ms


def torch_baselines() -> dict:
    """Measure-once-and-cache torch-CPU baselines: GGN matvecs/sec AND the
    full reference-semantics HF step wall-clock (same model/batch/config)."""
    cached = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
    dirty = False
    if "torch_cpu_ggn_matvecs_per_sec" not in cached:
        from benchmarks.torch_baseline import measure_ggn_matvecs_per_sec

        cached["torch_cpu_ggn_matvecs_per_sec"] = (
            measure_ggn_matvecs_per_sec(batch_size=BATCH_SIZE, num_matvecs=3)
        )
        cached["config"] = (
            f"resnet18-mnist b{BATCH_SIZE} torch.func linearize"
        )
        dirty = True
    if "torch_cpu_hf_step_seconds" not in cached:
        from benchmarks.torch_baseline import (
            measure_reference_hf_step_seconds,
        )

        sec, its = measure_reference_hf_step_seconds(
            batch_size=BATCH_SIZE, cg_max_iter=50, num_steps=3
        )
        cached["torch_cpu_hf_step_seconds"] = sec
        cached["torch_cpu_hf_step_cg_iters"] = its
        dirty = True
    if dirty:
        with open(CACHE, "w") as f:
            json.dump(cached, f, indent=1)
    return cached


if __name__ == "__main__":
    rates = measure_jax_matvecs_per_sec()
    rate = rates["median"]
    # The step program's remote compile occasionally hits a slow service
    # phase; never let that lose the primary metric.
    try:
        step_sec, step_iters, step_spread, step_per_iter_ms = (
            measure_jax_hf_step_seconds()
        )
    except Exception as e:  # pragma: no cover - service-dependent
        import sys

        print(f"hf-step measurement failed: {e!r}", file=sys.stderr)
        step_sec, step_iters, step_spread = None, None, None
        step_per_iter_ms = None
    try:
        baselines = torch_baselines()
    except Exception as e:  # pragma: no cover - environment-dependent
        import sys

        print(f"torch baseline (re)measurement failed: {e!r}",
              file=sys.stderr)
        baselines = {}
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                baselines = json.load(f)
    mv_base = baselines.get("torch_cpu_ggn_matvecs_per_sec")
    step_base = baselines.get("torch_cpu_hf_step_seconds")
    out = {
        "metric": "ggn_matvecs_per_sec_resnet18_mnist_b32",
        "value": round(rate, 2),
        "unit": "matvec/s",
        "vs_baseline": (
            round(rate / float(mv_base), 2) if mv_base else None
        ),
        # dispersion over the in-process repeats: the remote relay's run
        # latency swings ~2x between service phases, so a point estimate
        # alone can drift +/-10% round-to-round on an unchanged code path
        "dispersion": {
            "n_repeats": rates["n"],
            "iqr_pct": rates["iqr_pct"],
            "q1": round(rates["q1"], 2),
            "q3": round(rates["q3"], 2),
            "min": round(rates["min"], 2),
            "max": round(rates["max"], 2),
        },
    }
    if step_base:
        out.update(
            torch_cpu_hf_step_ms=round(float(step_base) * 1e3, 1),
            torch_cpu_hf_step_cg_iters=baselines.get(
                "torch_cpu_hf_step_cg_iters"
            ),
        )
    if step_sec is not None:
        out.update(
            hf_step_ms=round(step_sec * 1e3, 2),
            hf_step_cg_iters=step_iters,
            hf_step_iqr_pct=step_spread,
            hf_step_ms_per_cg_iter=step_per_iter_ms,
        )
        if step_base:
            out["hf_step_vs_torch_cpu"] = round(
                float(step_base) / step_sec, 2
            )
    print(json.dumps(out))
