"""XLA-measured FLOPs/bytes for the MFU and roofline tables.

Round 2's MFU figures used analytic FLOP models ("2x forward", "jvp+vjp
~= 4x forward"); this probe replaces them with the compiler's own
accounting (``jit(...).lower().compile().cost_analysis()``) and settles
which precision the "f32 path" actually runs at, via an in-process A/B of
``jax.default_matmul_precision`` DEFAULT vs HIGHEST on the same chain
(on TPU, DEFAULT lowers f32 convs/matmuls to bf16 multiplier passes;
HIGHEST forces the multi-pass f32-equivalent algorithm).

Outputs, per workload:
  measured flops/matvec, bytes/matvec, wall-clock, TFLOP/s, and the
  DEFAULT vs HIGHEST timing ratio.

Run on the real chip:  python benchmarks/cost_analysis_probe.py
(CPU smoke:            python benchmarks/cost_analysis_probe.py --cpu)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
)
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss, init_resnet18, resnet18_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

NUM_MV = 20


def build_chain(params, ravel, x, y, dtype):
    def chain(params, v0):
        p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        xc = x.astype(dtype)
        _, _, _, gv = ggnvp_fn(
            lambda pp: resnet18_apply(pp, xc),
            lambda o: cross_entropy_loss(o, y),
            p,
        )

        def body(_, v):
            tangent = jax.tree_util.tree_map(
                lambda a: a.astype(dtype), ravel.unravel(v)
            )
            w = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), gv(tangent)
            )
            w = ravel.ravel(w)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MV, body, v0)

    return chain


def measured_cost(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return ca


def timed(fn, *args, reps=3):
    out = fn(*args)
    _ = float(out[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def run(batch, dtype, precision, with_cost=True):
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (batch,), 0, 10)
    v0 = jax.random.normal(jax.random.PRNGKey(7), (ravel.dim,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    with jax.default_matmul_precision(precision):
        chain = jax.jit(build_chain(params, ravel, x, y, dtype))
        # NOTE: an explicit lower().compile() does NOT seed the jit
        # dispatch cache, so cost analysis doubles the (expensive remote)
        # compile count -- skipped for timing-only sweeps.
        ca = measured_cost(chain, params, v0) if with_cost else None
        sec = timed(chain, params, v0)
    if ca is not None:
        flops = float(ca.get("flops", float("nan")))
        byt = float(ca.get("bytes accessed", float("nan")))
        tflops = flops / sec / 1e12
        print(
            f"b{batch} {jnp.dtype(dtype).name} prec={precision}: "
            f"XLA flops/matvec {flops / NUM_MV:.3e}, bytes/matvec "
            f"{byt / NUM_MV:.3e}, {sec / NUM_MV * 1e3:.2f} ms/matvec, "
            f"{tflops:.1f} TFLOP/s (XLA-counted)",
            flush=True,
        )
    else:
        print(
            f"b{batch} {jnp.dtype(dtype).name} prec={precision}: "
            f"{sec / NUM_MV * 1e3:.2f} ms/matvec "
            f"({NUM_MV * batch / sec:,.0f} sample-matvecs/s)",
            flush=True,
        )
    return sec


def full_step_cost():
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
    config = HFConfig(damping=1.0, cg_max_iter=50)
    step = make_hf_step(fns, config, ravel)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (32,), 0, 10)
    state = init_state(ravel, config)

    import functools

    @jax.jit
    def raw(params, state, batch):
        from pytorchhessianfree_tpu import hf_step

        return hf_step(params, state, batch, fns=fns, config=config,
                       ravel=ravel)

    ca = measured_cost(raw, params, state, (x, y))
    print(
        f"full HF step (b32, cg<=50): XLA flops {float(ca['flops']):.3e}, "
        f"bytes accessed {float(ca['bytes accessed']):.3e}",
        flush=True,
    )


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    small = "--cpu" in sys.argv
    if "--big" in sys.argv:
        # The decisive A/B for the round-2 "112 TFLOP/s on the f32 path"
        # claim: at b512 the chain is MXU-bound, so if f32-DEFAULT runs at
        # bf16 speed the f32 path was bf16 passes all along; if it is
        # ~2-4x slower than bf16, it is genuine f32-precision compute.
        t_def = run(512, jnp.float32, "default", with_cost=False)
        t_hi = run(512, jnp.float32, "highest", with_cost=False)
        t_bf = run(512, jnp.bfloat16, "default", with_cost=False)
        print(
            f"b512 ratios: f32-HIGHEST/f32-DEFAULT {t_hi / t_def:.2f}x, "
            f"f32-DEFAULT/bf16 {t_def / t_bf:.2f}x",
            flush=True,
        )
        sys.exit(0)
    b_hdl = 8 if small else 32
    b_big = 16 if small else 512
    t_def = run(b_hdl, jnp.float32, "default")
    t_hi = run(b_hdl, jnp.float32, "highest")
    print(
        f"HIGHEST/DEFAULT wall-clock ratio at b{b_hdl} f32: "
        f"{t_hi / t_def:.2f}x "
        "(>~2x => DEFAULT was using bf16 multiplier passes)",
        flush=True,
    )
    run(b_big, jnp.bfloat16, "default")
    if not small:
        full_step_cost()
