"""HBM roofline probe: separate dispatch latency from streaming bandwidth.

VERDICT r1 item #3: BENCH_DETAILS' 112 GB/s "bare op" figure vs the v5e's
~819 GB/s spec needed an explanation.  This sweeps vector sizes 1 MB -> 1 GB
for a minimal read+write elementwise op (y = x * 1.0000001, executed K times
inside one fori_loop so per-dispatch overhead amortizes), fits
time = latency + bytes / bandwidth, and reports the asymptotic bandwidth
and the latency floor.  Also measures the GGN matvec's achieved bytes and
FLOPs at several batch sizes for the MFU / %-roofline table.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

K = 20  # op repetitions per timed call (amortizes dispatch)


def timed(fn, *args):
    out = fn(*args)
    _ = float(jax.numpy.ravel(out)[0])  # force completion through the relay
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.numpy.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def stream_probe():
    print("== streaming bandwidth sweep (read+write elementwise, K=20) ==")
    sizes_mb = [1, 4, 16, 45, 128, 256, 512, 1024]
    pts = []
    for mb in sizes_mb:
        n = mb * 1024 * 1024 // 4

        @jax.jit
        def op(x):
            def body(_, v):
                return v * jnp.float32(1.0000001)
            return jax.lax.fori_loop(0, K, body, x)

        x = jnp.ones((n,), jnp.float32)
        jax.block_until_ready(x)
        t = timed(op, x) / K
        gbps = 2 * n * 4 / t / 1e9  # read + write
        pts.append((n * 4, t))
        print(f"  {mb:5d} MB: {t*1e3:8.3f} ms/op  -> {gbps:7.1f} GB/s eff.",
              flush=True)
    # fit t = a + bytes/BW on the largest half
    big = pts[len(pts) // 2:]
    A = np.array([[1.0, b] for b, _ in big])
    tv = np.array([t for _, t in big])
    coef, *_ = np.linalg.lstsq(A, tv, rcond=None)
    lat, inv_bw = coef
    print(f"  asymptotic streaming bandwidth ~ {2e-9 / inv_bw:.1f} GB/s "
          f"(read+write), dispatch/latency floor ~ {lat*1e3:.3f} ms",
          flush=True)


def ggn_mfu():
    from pytorchhessianfree_tpu import TrainableRavel
    from pytorchhessianfree_tpu.models import (
        cross_entropy_loss, init_resnet18, resnet18_apply,
    )
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

    print("== GGN matvec achieved bytes/FLOPs (ResNet-18/MNIST) ==")
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    ravel = TrainableRavel(params)
    nparams = ravel.dim
    for batch in (32, 128, 256, 512):
        kx, ky = jax.random.split(jax.random.PRNGKey(batch))
        x = jax.random.normal(kx, (batch, 28, 28, 1), jnp.float32)
        y = jax.random.randint(ky, (batch,), 0, 10)

        @jax.jit
        def chain(params, x, y, v0):
            _, _, _, mv = ggnvp_fn(
                lambda p: resnet18_apply(p, x),
                lambda o: cross_entropy_loss(o, y), params,
            )
            def body(_, v):
                w = ravel.ravel(mv(ravel.unravel(v)))
                return w / jnp.linalg.norm(w)
            return jax.lax.fori_loop(0, K, body, v0)

        v0 = jax.random.normal(jax.random.PRNGKey(1), (nparams,), jnp.float32)
        v0 = v0 / jnp.linalg.norm(v0)
        t = timed(chain, params, x, y, v0) / K
        # cost model: fwd tangent + bwd tangent ~ 2x fwd FLOPs of the model;
        # ResNet-18 on 28x28x1 ~ 0.48 GFLOP/sample fwd (conv-dominated)
        fwd_flops = 0.48e9
        flops = 2 * fwd_flops * batch
        # weight traffic: ~3 reads of the 44.7 MB param set (jvp weights,
        # vjp weights, vjp residual use) + vector read/write
        bytes_moved = 3 * nparams * 4 + 2 * nparams * 4
        print(
            f"  b{batch:4d}: {t*1e3:7.2f} ms/matvec | "
            f"{1/t:7.1f} mv/s | {flops/t/1e12:6.2f} TFLOP/s "
            f"(~{flops/t/197e12*100:4.1f}% of v5e bf16 peak, f32 path) | "
            f">= {bytes_moved/t/1e9:5.1f} GB/s weight+vec traffic",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    stream_probe()
    ggn_mfu()
