"""Transformer evidence parity (VERDICT r2 next-round #6): the attention
family gets the same class of numbers as the conv families.

Phases (pick with argv; each phase is sized to fit one remote-compile
budget):

  step     matvec-chain AND full-HF-step compile + run times, measured
           IN ONE PROCESS (the in-process A/B round 2 never did for the
           536 s compile claim -- remote-service compile latency is
           bimodal, so only same-process numbers are comparable).
  sharded  the 2-D (data x model) sharded step program running on the
           real chip via a 1-device mesh (code-path evidence; real-ICI
           scaling needs hardware this environment does not have) plus
           a 30-step scanned train loop -> loss milestones, sustained
           ms/step, samples/s (the transformer target-loss row).

Model: 512-d, 6-layer, 8-head encoder, seq 128, vocab 1024 (~19M params)
-- same config as transformer_bench.py (the round-2 matvec bench).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
    make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import cross_entropy_loss
from pytorchhessianfree_tpu.models.transformer import (
    init_transformer, transformer_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

PHASE = "sharded" if "sharded" in sys.argv else "step"
D_MODEL, LAYERS, D_FF, HEADS = 512, 6, 2048, 8
VOCAB, T, CLASSES, BATCH = 1024, 128, 64, 32
NUM_MV = 50

key = jax.random.PRNGKey(0)
params = init_transformer(
    key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS,
    d_ff=D_FF, num_classes=CLASSES, max_len=T,
)
ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(
    model_fn=lambda p, x: transformer_apply(p, x, n_heads=HEADS),
    loss_outer=cross_entropy_loss,
)
config = HFConfig(damping=1.0, cg_max_iter=50)
kx, ky = jax.random.split(key)
tokens = jax.random.randint(kx, (BATCH, T), 0, VOCAB)
labels = jax.random.randint(ky, (BATCH,), 0, CLASSES)
print(f"transformer {ravel.unpadded_dim:,} params, b{BATCH} seq{T}, "
      f"phase={PHASE}", flush=True)


def force(v):
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(v)[0])[0])


if PHASE == "step":
    @jax.jit
    def chain(params, v0):
        _, _, _, gv = ggnvp_fn(
            lambda p: transformer_apply(p, tokens, n_heads=HEADS),
            lambda o: cross_entropy_loss(o, labels),
            params,
        )

        def body(_, v):
            w = ravel.ravel(gv(ravel.unravel(v)))
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, NUM_MV, body, v0)

    v0 = jax.random.normal(jax.random.PRNGKey(7), (ravel.dim,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)
    t0 = time.perf_counter()
    force(chain(params, v0))
    print(f"matvec chain compile+run: {time.perf_counter() - t0:.0f}s",
          flush=True)
    ts = []
    for i in range(3):
        vi = jax.random.normal(jax.random.PRNGKey(10 + i), (ravel.dim,),
                               jnp.float32)
        vi = vi / jnp.linalg.norm(vi)
        force(vi)
        t0 = time.perf_counter()
        force(chain(params, vi))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"matvec: {NUM_MV / ts[1]:.1f}/s ({ts[1] / NUM_MV * 1e3:.2f} ms "
          "each)", flush=True)

    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    t0 = time.perf_counter()
    p, s, st = step(params, state, (tokens, labels))
    force(st.final_loss)
    print(f"full step compile+run: {time.perf_counter() - t0:.0f}s "
          "(same process as the chain compile above)", flush=True)
    times, iters = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        p, s, st = step(p, s, (tokens, labels))
        force(st.final_loss)
        times.append(time.perf_counter() - t0)
        iters.append(int(st.num_cg_iters))
    times.sort()
    med = times[1]
    print(f"full step: {med * 1e3:.1f} ms/step ({BATCH / med:,.0f} "
          f"samples/s), cg iters {iters}", flush=True)
else:
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    n = jax.device_count()
    mesh = make_mesh(n, axis_names=("data", "model"), shape=(1, n))
    sstep = make_sharded_hf_step(fns, config, ravel, mesh)
    state = init_state(ravel, config)
    t0 = time.perf_counter()
    p, s, st = sstep(params, state, (tokens, labels))
    force(st.final_loss)
    print(f"sharded step (mesh data=1 x model={n}) compile+run: "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, s, st = sstep(p, s, (tokens, labels))
        force(st.final_loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"sharded step: {times[1] * 1e3:.1f} ms/step "
          f"(cg {int(st.num_cg_iters)})", flush=True)

    # transformer target-loss row: teacher-labeled token task, scanned loop
    STEPS = 30
    teacher = init_transformer(
        jax.random.PRNGKey(99), vocab=VOCAB, d_model=D_MODEL,
        n_heads=HEADS, n_layers=LAYERS, d_ff=D_FF, num_classes=CLASSES,
        max_len=T,
    )
    kt, _ = jax.random.split(jax.random.PRNGKey(1))
    xs = jax.random.randint(kt, (8, BATCH, T), 0, VOCAB)
    ys = jnp.argmax(
        jax.vmap(lambda xb: transformer_apply(teacher, xb, n_heads=HEADS))(
            xs
        ),
        -1,
    )
    reps = -(-STEPS // 8)
    xs_s = jnp.concatenate([xs] * reps)[:STEPS]
    ys_s = jnp.concatenate([ys] * reps)[:STEPS]
    loop = make_hf_train_loop(fns, config, ravel)
    t0 = time.perf_counter()
    p, s, lst = loop(params, init_state(ravel, config), (xs_s, ys_s))
    force(p)
    print(f"train loop compile+run: {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    p, s, lst = loop(params, init_state(ravel, config), (xs_s, ys_s))
    force(p)
    total = time.perf_counter() - t0
    losses = [float(v) for v in lst.init_loss]
    print(f"sustained: {total / STEPS * 1e3:.1f} ms/step "
          f"({BATCH * STEPS / total:,.0f} samples/s)", flush=True)
    for tgt in (4.0, 3.0, 2.0, 1.0):
        hit = next((i for i, v in enumerate(losses) if v < tgt), None)
        print(f"target {tgt}: " + (f"step {hit}" if hit is not None
                                   else f"not reached (best {min(losses):.3f})"),
              flush=True)
    print("loss[0,5,15,29]:",
          " ".join(f"{losses[i]:.3f}" for i in (0, 5, 15, 29)), flush=True)
