"""Sustained decoder-LM throughput through the scanned on-device train
loop (the deployment shape), mirroring sustained_best_regime.py for the
attention family: T steps per dispatch removes the per-step relay latency
and lets XLA overlap across steps."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import (
    decoder_lm_apply, init_decoder_lm, next_token_loss,
)

D_MODEL, LAYERS, D_FF, HEADS = 512, 6, 2048, 8
VOCAB, T_SEQ, BATCH, T_STEPS = 1024, 128, 32, 8
A, B = 37, 11

key = jax.random.PRNGKey(0)
params = init_decoder_lm(
    key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS,
    d_ff=D_FF, max_len=T_SEQ,
)
ravel = TrainableRavel(params, pad_to_multiple=1024)
fns = HFModelFns(
    model_fn=lambda p, x: decoder_lm_apply(p, x, n_heads=HEADS),
    loss_outer=next_token_loss,
)
config = HFConfig(damping=1.0, cg_max_iter=50)
loop = make_hf_train_loop(fns, config, ravel)

start = jax.random.randint(key, (T_STEPS, BATCH, 1), 0, VOCAB)
toks = [start[..., 0]]
for _ in range(T_SEQ - 1):
    toks.append((A * toks[-1] + B) % VOCAB)
tokens = jnp.stack(toks, axis=2).astype(jnp.int32)  # [T_STEPS, BATCH, T_SEQ]
batches = (tokens, tokens)

t0 = time.perf_counter()
p, s, st = loop(params, init_state(ravel, config), batches)
_ = float(ravel.ravel(p)[0])
print(f"compile+run: {time.perf_counter() - t0:.0f}s", flush=True)

t0 = time.perf_counter()
p, s, st = loop(params, init_state(ravel, config), batches)
_ = float(ravel.ravel(p)[0])
total = time.perf_counter() - t0
print(
    f"sustained: {total:.2f}s for {T_STEPS} steps = "
    f"{total / T_STEPS * 1e3:.1f} ms/step "
    f"({T_STEPS * BATCH * (T_SEQ - 1) / total:,.0f} token-predictions/s)",
    flush=True,
)
print(f"cg iters/step: {[int(v) for v in st.num_cg_iters]}", flush=True)
print(f"loss[0,-1]: {float(st.init_loss[0]):.3f} "
      f"{float(st.init_loss[-1]):.3f}", flush=True)
