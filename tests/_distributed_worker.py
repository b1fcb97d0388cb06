"""Worker for the real multi-process distributed test.

Launched (twice) by tests/test_distributed.py: each process owns 4 virtual
CPU devices, joins a 2-process JAX runtime over a local coordinator, builds
the GLOBAL 8-device data mesh, feeds ONLY its own rows of the global batch
(global_batch_slice + make_array_from_process_local_data) and runs one
data-parallel HF step.  Process 0 also computes the single-device step on
the full batch and asserts the trajectories match -- the multi-host analog
of the DP-equivalence tests.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"  # "dp" | "sharded"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass  # newer JAX auto-selects; absence surfaces below if fatal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pytorchhessianfree_tpu import (  # noqa: E402
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models.mlp import (  # noqa: E402
    init_mlp,
    mlp_apply,
    mse_loss,
)
from pytorchhessianfree_tpu.parallel.data_parallel import (  # noqa: E402
    make_dp_hf_step,
)
from pytorchhessianfree_tpu.parallel.distributed import (  # noqa: E402
    global_batch_slice,
    initialize_distributed,
)

initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

if mode == "sharded":
    # 2-D mesh straddling the process boundary: the data axis runs ACROSS
    # processes (each host's shard stays host-local), the model axis runs
    # over each host's 4 local devices (solver-state collectives stay
    # intra-host -- the ICI-vs-DCN layout of a real pod).
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()).reshape(nproc, 4), ("data", "model")
    )
else:
    mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(-1), ("data",))
repl = NamedSharding(mesh, P())
shard = NamedSharding(mesh, P("data"))

key = jax.random.PRNGKey(0)
kp, kx, ky = jax.random.split(key, 3)
params = init_mlp(kp, dtype=jnp.float64)
N = 32
x = jax.random.normal(kx, (N, 7), jnp.float64)
y = jax.random.normal(ky, (N, 3), jnp.float64)

fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
config = HFConfig(damping=0.5, cg_max_iter=30)
ravel = TrainableRavel(params, pad_to_multiple=8 if mode == "sharded" else None)

# every host feeds ONLY its slice of the global batch
sl = global_batch_slice(N)
assert (sl.stop - sl.start) == N // nproc


def to_global(host_value, sharding):
    local = np.asarray(host_value)
    if sharding is shard:
        local = local[sl]
    return jax.make_array_from_process_local_data(sharding, local)


gx = to_global(x, shard)
gy = to_global(y, shard)
gparams = jax.tree_util.tree_map(lambda a: to_global(a, repl), params)
state0 = init_state(ravel, config)
gstate = jax.tree_util.tree_map(lambda a: to_global(a, repl), state0)

if mode == "sharded":
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    step_dp = make_sharded_hf_step(fns, config, ravel, mesh)
else:
    step_dp = make_dp_hf_step(fns, config, ravel, mesh)
p_dp, s_dp, st_dp = step_dp(gparams, gstate, (gx, gy))
jax.block_until_ready(p_dp)
if mode == "sharded":
    assert tuple(s_dp.x0.sharding.spec) == ("model",)

# replicated outputs are fully addressable on every process
p_dp_host = jax.tree_util.tree_map(np.asarray, jax.device_get(p_dp))

if pid == 0:
    # single-device oracle on the full batch (process 0 only -- the DP
    # result is identical on every process by construction)
    single_dev = jax.local_devices()[0]
    step_1 = make_hf_step(fns, config, ravel)
    with jax.default_device(single_dev):
        p_1, s_1, st_1 = step_1(
            jax.device_put(params, single_dev),
            init_state(ravel, config),
            (jax.device_put(x, single_dev), jax.device_put(y, single_dev)),
        )
    p_1_host = jax.tree_util.tree_map(np.asarray, jax.device_get(p_1))

    for a, b in zip(
        jax.tree_util.tree_leaves(p_1_host),
        jax.tree_util.tree_leaves(p_dp_host),
    ):
        np.testing.assert_allclose(a, b, atol=1e-8)
    assert int(st_dp.num_cg_iters) == int(st_1.num_cg_iters)

print(f"worker {pid}/{nproc} [{mode}]: ok "
      f"(cg {int(st_dp.num_cg_iters)}, loss {float(st_dp.init_loss):.6f})")
