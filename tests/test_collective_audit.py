"""Pin the HLO collective-audit parser (benchmarks/collective_audit.py) and
the DP communication structure it documents in docs/DESIGN.md: one
param-sized all-reduce per CG iteration, one scalar per trial iteration,
and a bounded number of param-sized reduces outside the loops."""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from benchmarks.collective_audit import _shape_bytes, audit_hlo, summarize
from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
)
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
from pytorchhessianfree_tpu.models.mlp import mse_loss
from pytorchhessianfree_tpu.optimizer import hf_step
from pytorchhessianfree_tpu.parallel.mesh import make_mesh


def test_shape_bytes():
    assert _shape_bytes("f32[100,2]{1,0}") == 800
    assert _shape_bytes("f64[3]{0}") == 24
    assert _shape_bytes("(f32[512]{0}, /*index=5*/f32[2,2]{1,0})") == (
        512 * 4 + 16
    )
    assert _shape_bytes("pred[]") == 1


def test_dp_step_collective_structure():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float32)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=1.0, cg_max_iter=10)
    ravel = TrainableRavel(params)  # unpadded: dim == n_params
    x = jax.random.normal(key, (16, 7), jnp.float32)
    y = jax.random.normal(key, (16, 3), jnp.float32)
    state = init_state(ravel, config)

    mesh = make_mesh(8, axis_names=("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    step = jax.jit(
        functools.partial(hf_step, fns=fns, config=config, ravel=ravel),
        out_shardings=repl,
    )
    hlo = step.lower(
        jax.device_put(params, repl),
        jax.device_put(state, repl),
        (jax.device_put(x, shard), jax.device_put(y, shard)),
    ).compile().as_text()

    per_comp, loop_bodies = audit_hlo(hlo)
    assert loop_bodies  # found the while bodies
    summary = summarize("dp_8_tiny", hlo)["collectives"]

    param_bytes = 4 * ravel.dim
    loop_groups = {k: v for k, v in summary.items() if k.startswith("LOOP")}
    # the CG body carries exactly one all-reduce whose payload is one
    # param-sized vector (the curvature-matvec psum)
    cg_like = [
        g for g in loop_groups.values()
        if g.get("all-reduce", {}).get("payload_bytes") == param_bytes
    ]
    assert len(cg_like) == 1
    assert cg_like[0]["all-reduce"]["count"] == 1
    # the trial-walk body reduces only scalars
    scalar_like = [
        g for g in loop_groups.values()
        if 0 < g.get("all-reduce", {}).get("payload_bytes", 0) <= 64
    ]
    assert len(scalar_like) >= 1
    # outside the loops: the merged gradient + warm-start-matvec reduce,
    # bounded by a few param-sized payloads
    once = summary.get("once-per-step", {})
    total_once = sum(v["payload_bytes"] for v in once.values())
    assert param_bytes <= total_once <= 4 * param_bytes


def test_pp_tick_loop_matches_bubble_model():
    """The GPipe bubble model checked against compiled HLO: the pipelined
    step's model passes are while loops of EXACTLY M+S-1 ticks, each tick
    moving one microbatch-sized ppermute (docs/DESIGN.md PP row)."""
    from benchmarks.collective_audit import pp_audit

    r = pp_audit(2, 4, batch=4, seq=8, d_model=16, d_ff=32, n_layers=2,
                 vocab=12)
    assert r["model_checks"]["trip_count==M+S-1"]
    assert r["model_checks"]["payload==microbatch"]
    assert r["ticks"] == 5 and abs(r["bubble_frac"] - 0.2) < 1e-9
    assert r["mb_bytes"] == (4 // 4) * 8 * 16 * 4
    # several distinct passes (gradient, matvec jvp+vjp, trials) embed the
    # tick loop in the step program
    assert r["tick_loops_found"] >= 3
