"""Current-defaults numbers: All-CNN-C step + 100-step sustained scanned
training (the BASELINE.json flagship config) in the padded vector space."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from pytorchhessianfree_tpu import (
    HFConfig, HFModelFns, TrainableRavel, init_state, make_hf_step,
    make_hf_train_loop,
)
from pytorchhessianfree_tpu.models import (
    allcnnc_apply, cross_entropy_loss, init_allcnnc, l2_regularizer,
    init_mlp, mlp_apply,
)

key = jax.random.PRNGKey(0)
params = init_allcnnc(key, num_classes=100)
fns = HFModelFns(
    model_fn=allcnnc_apply, loss_outer=cross_entropy_loss,
    loss_reg=l2_regularizer,
)
config = HFConfig(damping=1.0, cg_max_iter=50)
ravel = TrainableRavel(params, pad_to_multiple=1024)

# single step timing
step = make_hf_step(fns, config, ravel)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 32, 32, 3), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 100)
t0 = time.perf_counter()
p, s, st = step(params, init_state(ravel, config), (x, y))
_ = float(ravel.ravel(p)[0])
print(f"allcnnc step: compile {time.perf_counter()-t0:.1f}s "
      f"(cg {int(st.num_cg_iters)})", flush=True)
ts = []
for i in range(4):
    s0 = init_state(ravel, config)
    t0 = time.perf_counter()
    p2, s2, st2 = step(params, s0, (x, y))
    _ = float(ravel.ravel(p2)[0])
    ts.append(time.perf_counter() - t0)
ts.sort()
print(f"allcnnc step: {ts[len(ts)//2]*1e3:.0f} ms median", flush=True)

# sustained: 100 scanned steps over 16 repeating teacher-labeled batches
tkey = jax.random.PRNGKey(99)
teacher = init_allcnnc(tkey, num_classes=100)
xs = jax.random.normal(kx, (16, 32, 32, 32, 3), jnp.float32)
ys = jnp.argmax(jax.vmap(lambda xb: allcnnc_apply(teacher, xb))(xs), -1)
xs100 = jnp.concatenate([xs] * 7)[:100]
ys100 = jnp.concatenate([ys] * 7)[:100]

loop = make_hf_train_loop(fns, config, ravel)
t0 = time.perf_counter()
pl, sl, stats = loop(params, init_state(ravel, config), (xs100, ys100))
_ = float(ravel.ravel(pl)[0])
compile_and_run = time.perf_counter() - t0
t0 = time.perf_counter()
pl, sl, stats = loop(params, init_state(ravel, config), (xs100, ys100))
_ = float(ravel.ravel(pl)[0])
run = time.perf_counter() - t0
il = [float(v) for v in stats.init_loss]
print(f"sustained 100 steps: {run:.2f}s total = {run*10:.1f} ms/step "
      f"(first call incl. compile {compile_and_run:.1f}s)", flush=True)
print("loss first/10/50/100:", f"{il[0]:.3f} {il[9]:.3f} {il[49]:.3f} "
      f"{il[99]:.3f}", flush=True)
