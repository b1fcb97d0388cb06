"""Predicted-vs-measured HBM audit of the HF step.

Round-3 verdict: ``utils.memory.solver_memory_bytes`` was only ever tested
against its own formula.  This harness closes the loop with two independent
measurements:

- ``jax.Device.memory_stats()['peak_bytes_in_use']`` sampled around real
  steps on the chip (one config per process -- the peak counter is
  monotonic per process);
- ``compiled.memory_analysis()`` -- XLA's buffer assignment for the exact
  program (argument/output/temp/alias bytes), which is what actually
  determines OOM, and is available for sharded programs without hardware.

Usage:
  python benchmarks/memory_audit.py CONFIG        # one config, one process
  python benchmarks/memory_audit.py list          # show configs

Each run prints one JSON line: predicted solver bytes, XLA temp/total
bytes, live peak bytes, step wall-clock.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
)
from pytorchhessianfree_tpu.config import CGConfig
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_mlp,
    init_resnet18,
    mlp_apply,
    resnet18_apply,
)
from pytorchhessianfree_tpu.models.mlp import mse_loss
from pytorchhessianfree_tpu.utils.memory import solver_memory_bytes


def _resnet(batch, width=1.0, **cfg_kw):
    key = jax.random.PRNGKey(0)
    params = init_resnet18(
        key, num_classes=10, in_channels=1, width_scale=width
    )
    fns = HFModelFns(model_fn=resnet18_apply, loss_outer=cross_entropy_loss)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch, 28, 28, 1), jnp.float32)
    y = jax.random.randint(ky, (batch,), 0, 10)
    return params, fns, (x, y), cfg_kw


def _bigmlp(batch, sizes, **cfg_kw):
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, sizes=sizes)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch, sizes[0]), jnp.float32)
    y = jax.random.normal(ky, (batch, sizes[-1]), jnp.float32)
    return params, fns, (x, y), cfg_kw


# Escalation ladder: resnet at growing batch/width, a params-heavy MLP,
# and the rescue knobs applied to whatever OOMs.
CONFIGS = {
    "mlp_tiny": lambda: _bigmlp(16, (7, 5, 5, 3)),  # harness smoke config
    "resnet_b32": lambda: _resnet(32),
    "resnet_b512": lambda: _resnet(512),
    "resnet_b2048": lambda: _resnet(2048),
    "resnet_b2048_remat": lambda: _resnet(2048, remat=True),
    "resnet_b4096": lambda: _resnet(4096),
    "resnet_b4096_remat": lambda: _resnet(4096, remat=True),
    "resnet_b8192_remat": lambda: _resnet(8192, remat=True),
    # activation-bound wall probes (b2048 measured 2.93 GB temp -> ~8x)
    "resnet_b16384": lambda: _resnet(16384),
    "resnet_b16384_remat": lambda: _resnet(16384, remat=True),
    "resnet_w2_b512": lambda: _resnet(512, width=2.0),
    "resnet_w4_b256": lambda: _resnet(256, width=4.0),
    "resnet_w4_b256_bf16grid": lambda: _resnet(
        256, width=4.0, cg=CGConfig(store_dtype="bfloat16")
    ),
    # wall-bracketing MLPs (one flat f32 vector = 4 bytes/param):
    "mlp_100m": lambda: _bigmlp(256, (4096, 8192, 8192, 16)),
    "mlp_150m": lambda: _bigmlp(256, (4096, 8192, 8192, 8192, 16)),
    "mlp_235m": lambda: _bigmlp(256, (4096, 8192, 8192, 8192, 8192, 16)),
    # alias kept for the r4 ladder logs ("200m" underestimated: 235M)
    "mlp_200m": lambda: _bigmlp(256, (4096, 8192, 8192, 8192, 8192, 16)),
    "mlp_200m_bf16grid": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16"),
    ),
    # ~302M: beyond the 235M cg50 wall; probe whether the CG budget knob
    # (fewer grid rows at cg_max_iter=25) + bf16 grid + donation fits it
    "mlp_300m_bf16grid": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16"),
    ),
    # the round-5 push past the 235M wall: compose the bf16 grid with a
    # COARSER backtracking grid (grid_gamma is a reference cg parameter,
    # reference cg.py:152) -- gamma 2.0 cuts cg25's grid 11 rows -> 5
    # (3.0 -> 3), trading backtracking resolution for ~0.6 GB/row at 302M
    "mlp_300m_bf16grid_gamma2": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16", grid_gamma=2.0),
    ),
    "mlp_300m_bf16grid_gamma3": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16", grid_gamma=3.0),
    ),
    # next rung up (~370M): does the same composition clear it?
    "mlp_370m_bf16grid_gamma2": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16", grid_gamma=2.0),
    ),
    "mlp_370m_bf16grid_gamma3": lambda: _bigmlp(
        256, (4096, 8192, 8192, 8192, 8192, 8192, 8192, 16),
        cg=CGConfig(store_dtype="bfloat16", grid_gamma=3.0),
    ),
    # ~470M params: 11 GB of f32 grid rows at cg50 -- needs every knob
    "mlp_470m_bf16grid": lambda: _bigmlp(
        128, (8192, 12288, 12288, 12288, 12288, 16),
        cg=CGConfig(store_dtype="bfloat16"),
    ),
    "mlp_470m": lambda: _bigmlp(
        128, (8192, 12288, 12288, 12288, 12288, 16)
    ),
}


def run(name, cg_max_iter=50, donate=False, compile_only=False):
    params, fns, batch, cfg_kw = CONFIGS[name]()
    config = HFConfig(damping=1.0, cg_max_iter=cg_max_iter, **cfg_kw)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    n_params = ravel.dim
    pred = solver_memory_bytes(ravel, config)

    dev = jax.devices()[0]
    out = {
        "config": name,
        "platform": dev.platform,
        "flat_dim": n_params,
        "predicted_solver_bytes": pred["total"],
        "donate": donate,
    }

    # donation aliases the param/state argument buffers into the outputs --
    # at 235M params that is ~3.7 GB of HBM the step does not double-hold.
    # jit hf_step directly: make_hf_step returns a plain wrapper, and
    # re-jitting the wrapper would silently drop its donate_argnums.
    import functools

    from pytorchhessianfree_tpu.optimizer import hf_step

    state = init_state(ravel, config)
    jitted = jax.jit(
        functools.partial(hf_step, fns=fns, config=config, ravel=ravel),
        donate_argnums=(0, 1) if donate else (),
    )
    try:
        lowered = jitted.lower(params, state, batch)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            out["xla_memory"] = {
                "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
                "output_bytes": getattr(ma, "output_size_in_bytes", None),
                "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
                "alias_bytes": getattr(ma, "alias_size_in_bytes", None),
                "generated_code_bytes": getattr(
                    ma, "generated_code_size_in_bytes", None
                ),
            }
    except Exception as e:
        msg = repr(e)
        # the actionable part of remote-compile errors is at the END
        out["compile_error_tail"] = msg[-3000:]
        # ... but an OOM's "Largest program allocations" list puts the
        # DOMINANT buffers first — keep the head of that list too
        marker = msg.find("Largest program allocations")
        if marker >= 0:
            out["oom_largest_allocations_head"] = msg[marker:marker + 4000]
        print(json.dumps(out), flush=True)
        return out

    if compile_only:
        # buffer assignment is what decides OOM; executing a 300M-param
        # step on the 1-core CPU backend would take tens of minutes
        print(json.dumps(out), flush=True)
        return out

    try:
        t0 = time.perf_counter()
        params2, state2, stats = compiled(params, state, batch)
        _ = float(stats.final_loss)
        out["compile_plus_first_step_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        params2, state2, stats = compiled(params2, state2, batch)
        _ = float(stats.final_loss)
        out["step_s"] = round(time.perf_counter() - t0, 3)
        out["cg_iters"] = int(stats.num_cg_iters)
        ms = dev.memory_stats() or {}
        out["live_peak_bytes"] = ms.get("peak_bytes_in_use")
        out["live_bytes_in_use"] = ms.get("bytes_in_use")
        out["hbm_limit_bytes"] = ms.get("bytes_limit")
    except Exception as e:
        out["run_error"] = repr(e)[:300]
    print(json.dumps(out), flush=True)
    return out


def run_sharded_analysis(name="mlp_200m", cg_max_iter=50):
    """Per-device XLA buffer assignment of the model-axis-sharded step vs
    the single-device step, on the virtual CPU mesh (compile only, no
    execution): the memory claim behind solver sharding, measured from the
    exact programs."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorchhessianfree_tpu.optimizer import hf_step
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.parallel.sharded import _prepare

    params, fns, batch, cfg_kw = CONFIGS[name]()
    config = HFConfig(damping=1.0, cg_max_iter=cg_max_iter, **cfg_kw)
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    pred = solver_memory_bytes(ravel, config)
    state = init_state(ravel, config)

    step1 = jax.jit(
        functools.partial(hf_step, fns=fns, config=config, ravel=ravel)
    )
    ma1 = step1.lower(params, state, batch).compile().memory_analysis()

    mesh = make_mesh(8, axis_names=("data", "model"))
    (
        config2, use_data, repl, vec_s, buf_s, shard_vec, shard_buf, state_s
    ) = _prepare(config, ravel, mesh, "data", "model")
    batch_s = NamedSharding(mesh, P("data"))
    step8 = jax.jit(
        functools.partial(
            hf_step, fns=fns, config=config2, ravel=ravel,
            shard_vec=shard_vec, shard_buf=shard_buf,
        ),
        out_shardings=(repl, state_s, repl),
    )
    ma8 = step8.lower(
        jax.device_put(params, repl),
        jax.device_put(state, state_s),
        jax.tree_util.tree_map(
            lambda a: jax.device_put(a, batch_s), batch
        ),
    ).compile().memory_analysis()

    out = {
        "config": name,
        "flat_dim": ravel.dim,
        "predicted_solver_total": pred["total"],
        "predicted_per_device_model4": solver_memory_bytes(
            ravel, config, model_axis_size=4
        )["per_device"],
        "xla_temp_single_device": ma1.temp_size_in_bytes,
        "xla_temp_per_device_2x4": ma8.temp_size_in_bytes,
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] == "list":
        print(" ".join(CONFIGS))
        sys.exit(0)
    if sys.argv[1] == "sharded":
        # The sharded analysis needs the virtual 8-device CPU platform.
        # XLA_FLAGS is read at (lazy) backend init, and the sitecustomize
        # hook's platform pin must be overridden via jax.config AFTER
        # import -- both still possible here because no device has been
        # queried yet on this path (run() above is what touches the TPU).
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        run_sharded_analysis(
            sys.argv[2] if len(sys.argv) > 2 else "mlp_200m"
        )
        sys.exit(0)
    args = sys.argv[2:]
    if "cpu" in args:
        # compile-only CPU analysis must not touch the TPU backend
        jax.config.update("jax_platforms", "cpu")
    iters = [a for a in args if a.isdigit()]
    run(
        sys.argv[1],
        cg_max_iter=int(iters[0]) if iters else 50,
        donate="donate" in args,
        compile_only="compile_only" in args,
    )
