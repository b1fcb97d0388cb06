"""Drive training from the native C++ prefetching batch loader.

The reference feeds its workloads with torch DataLoaders
(reference examples/example_utils.py:41-56); this framework's native runtime
component assembles shuffled batches on background C++ threads so host-side
batch prep overlaps the device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
from example_utils import force_cpu_if_requested, report

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply, mse_loss
from pytorchhessianfree_tpu.runtime import PrefetchLoader

if __name__ == "__main__":
    print(f"Running prefetch-loader demo on {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    # A fixed synthetic regression dataset (the loader owns shuffling).
    X = rng.standard_normal((2048, 7)).astype(np.float32)
    W = rng.standard_normal((7, 3)).astype(np.float32)
    Y = np.tanh(X @ W) + 0.05 * rng.standard_normal((2048, 3)).astype(
        np.float32
    )

    loader = PrefetchLoader(
        X, Y, batch_size=128, seed=0, depth=4, num_threads=2
    )
    print(f"batches/epoch = {loader.batches_per_epoch}")

    params = init_mlp(jax.random.PRNGKey(0))
    opt = HessianFree(
        params, model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5
    )

    for step_idx in range(8):
        x, y = loader.next_batch()
        opt.step((jnp.asarray(x), jnp.asarray(y)))
        report(step_idx, opt)
    loader.close()
