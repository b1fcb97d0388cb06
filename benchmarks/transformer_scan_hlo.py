"""Program-size + local-compile A/B: scanned vs unrolled transformer layers.

The remote TPU compile service's latency is bimodal (29-475 s for identical
programs, BENCH_DETAILS), so cold-process compile wall-clocks cannot cleanly
attribute a difference to the program itself.  This probe removes the
service: it lowers the GGN matvec-chain program for BOTH variants and
reports (a) StableHLO/optimized-HLO instruction counts and text sizes --
deterministic program-complexity measures -- and (b) local XLA:CPU compile
wall-clock, which has no remote phase.

Usage: python benchmarks/transformer_scan_hlo.py [n_layers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import cross_entropy_loss
from pytorchhessianfree_tpu.models.transformer import (
    init_transformer,
    transformer_apply,
)
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

NUM_MATVECS = 50
D_MODEL, D_FF, HEADS = 512, 2048, 8
VOCAB, T, CLASSES = 1024, 128, 64
BATCH = 32


def main(n_layers=6):
    key = jax.random.PRNGKey(0)
    params = init_transformer(
        key, vocab=VOCAB, d_model=D_MODEL, n_heads=HEADS, n_layers=n_layers,
        d_ff=D_FF, num_classes=CLASSES, max_len=T,
    )
    ravel = TrainableRavel(params, pad_to_multiple=1024)
    kx, ky = jax.random.split(key)
    tokens = jax.random.randint(kx, (BATCH, T), 0, VOCAB)
    labels = jax.random.randint(ky, (BATCH,), 0, CLASSES)
    v0 = jax.random.normal(jax.random.PRNGKey(7), (ravel.dim,), jnp.float32)

    for scan in (True, False):
        @jax.jit
        def chain(params, v0, _scan=scan):
            _, _, _, gv = ggnvp_fn(
                lambda p: transformer_apply(
                    p, tokens, n_heads=HEADS, scan_layers=_scan
                ),
                lambda o: cross_entropy_loss(o, labels),
                params,
            )

            def body(_, v):
                w = ravel.ravel(gv(ravel.unravel(v)))
                return w / jnp.linalg.norm(w)

            return jax.lax.fori_loop(0, NUM_MATVECS, body, v0)

        t0 = time.perf_counter()
        lowered = chain.lower(params, v0)
        t_lower = time.perf_counter() - t0
        stablehlo = lowered.as_text()
        n_stablehlo = sum(
            1 for ln in stablehlo.splitlines() if "=" in ln
        )
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        hlo = compiled.as_text()
        n_hlo = sum(1 for ln in hlo.splitlines() if " = " in ln)
        print(
            f"scan_layers={scan}: trace+lower {t_lower:.1f}s, "
            f"XLA:CPU compile {t_compile:.1f}s | "
            f"stablehlo {len(stablehlo) / 1e6:.2f} MB / {n_stablehlo} instr"
            f" | optimized HLO {len(hlo) / 1e6:.2f} MB / {n_hlo} instr",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
