"""Shared example utilities: synthetic test problems.

Analog of the reference's example helpers
(reference examples/example_utils.py:23-124), with one deliberate deviation:
the reference downloads MNIST / CIFAR-100 via torchvision / DeepOBS; this
environment has no network egress, so the image workloads run on synthetic
data with the exact real shapes (1x28x28x10-class, 3x32x32x100-class).  The
optimizer path being exercised is identical -- HF never looks at the data
semantics, only at loss/gradient/curvature evaluations.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def force_cpu_if_requested():
    """`--cpu` on any example pins the (possibly remote-TPU) JAX platform to
    host CPU with 8 virtual devices, for quick local runs."""
    if "--cpu" in sys.argv:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        jax.config.update("jax_platforms", "cpu")


def get_small_nn_problem(key, N=16, sizes=(7, 5, 5, 3), dtype=jnp.float32):
    """Small-MLP + MSE problem (reference examples/example_utils.py:23-56)."""
    from pytorchhessianfree_tpu.models import init_mlp

    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, sizes, dtype)
    x = jax.random.normal(kx, (N, sizes[0]), dtype)
    y = jax.random.normal(ky, (N, sizes[-1]), dtype)
    return params, (x, y)


def synthetic_mnist_batch(key, batch_size=32, dtype=jnp.float32):
    """[N, 28, 28, 1] images + 10-class labels (NHWC)."""
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch_size, 28, 28, 1), dtype)
    y = jax.random.randint(ky, (batch_size,), 0, 10)
    return x, y


def synthetic_cifar100_batch(key, batch_size=32, dtype=jnp.float32):
    """[N, 32, 32, 3] images + 100-class labels (NHWC)."""
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch_size, 32, 32, 3), dtype)
    y = jax.random.randint(ky, (batch_size,), 0, 100)
    return x, y


def parse_data_dir():
    """``--data <dir>`` on any example switches from synthetic batches to a
    real dataset streamed through the native loader.

    Expected file format (documented in README "Real datasets"):
    ``<dir>/train_x.npy`` -- float32 ``[N, H, W, C]`` (NHWC) preprocessed
    images (MNIST: ``[N, 28, 28, 1]`` scaled to [0, 1] like torchvision
    ``ToTensor``; CIFAR-100: ``[N, 32, 32, 3]`` per-channel standardized
    like DeepOBS) and ``<dir>/train_y.npy`` -- integer ``[N]`` class labels.
    """
    if "--data" in sys.argv:
        i = sys.argv.index("--data")
        if i + 1 >= len(sys.argv):
            raise SystemExit(
                "--data needs a directory argument (containing "
                "train_x.npy [N,H,W,C] float32 + train_y.npy [N] int)"
            )
        d = sys.argv[i + 1]
        for f in ("train_x.npy", "train_y.npy"):
            if not os.path.exists(os.path.join(d, f)):
                raise FileNotFoundError(
                    f"--data {d}: missing {f} (expected train_x.npy "
                    "[N,H,W,C] float32 + train_y.npy [N] int labels)"
                )
        return d
    return None


def real_batch_stream(data_dir, batch_size, sharding=None, seed=0):
    """Real-dataset pipeline: mmap-backed ``.npy`` -> C++ PrefetchLoader
    (threaded shuffled gathers) -> DevicePrefetcher (host->device transfer,
    optionally pre-sharded, overlapped with device compute).

    Returns the DevicePrefetcher (an iterator of on-device ``(x, y)``
    batches; also a context manager -- close it when done).
    """
    from pytorchhessianfree_tpu.runtime.loader import PrefetchLoader
    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    loader = PrefetchLoader.from_npy(
        os.path.join(data_dir, "train_x.npy"),
        os.path.join(data_dir, "train_y.npy"),
        batch_size,
        seed=seed,
    )
    # close_source: closing the prefetcher also shuts the native loader's
    # threads/mmap handles down (the stream owns the whole pipeline).
    return DevicePrefetcher(loader, sharding=sharding, close_source=True)


def report(step_idx, opt):
    h = opt.history
    print(
        f"step {step_idx}: loss {h['init_losses'][-1]:.6f} -> "
        f"{h['final_losses'][-1]:.6f} | lr {h['learning_rates'][-1]:.4f} | "
        f"damping {h['dampings'][-1]:.4f} | cg {h['num_cg_iters'][-1]} iters "
        f"({h['cg_reasons'][-1]}) | best iter {h['best_cg_iters'][-1]}"
    )
