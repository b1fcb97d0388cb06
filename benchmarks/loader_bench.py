"""Native prefetch-loader throughput vs a Python/NumPy gather loop.

Quantifies the C++ runtime component: shuffled mini-batch assembly on
background threads vs the single-threaded fancy-indexing loop a plain
training script would run.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pytorchhessianfree_tpu.runtime import PrefetchLoader

N, D, BS, BATCHES = 100_000, 784, 256, 400


def python_batcher(X, Y, bs, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        perm = rng.permutation(X.shape[0])
        for i in range(0, X.shape[0] - bs + 1, bs):
            idx = perm[i : i + bs]
            yield X[idx], Y[idx]


def main():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(np.float32)
    Y = rng.standard_normal((N, 1)).astype(np.float32)

    gen = python_batcher(X, Y, BS)
    next(gen)  # warm
    t0 = time.perf_counter()
    for _ in range(BATCHES):
        next(gen)
    t_py = time.perf_counter() - t0

    loader = PrefetchLoader(X, Y, batch_size=BS, seed=0, depth=8,
                            num_threads=2)
    loader.next_batch()  # warm / fill ring
    t0 = time.perf_counter()
    for _ in range(BATCHES):
        loader.next_batch()
    t_cc = time.perf_counter() - t0
    loader.close()

    print(f"python gather : {BATCHES / t_py:8.1f} batches/s")
    print(f"native loader : {BATCHES / t_cc:8.1f} batches/s "
          f"({t_py / t_cc:.2f}x)")


if __name__ == "__main__":
    main()
