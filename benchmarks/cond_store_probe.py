"""Probe: skip the iterate-buffer store on off-grid CG iterations?

The CG loop currently writes EVERY iterate into the buffer -- grid rows at
grid iterations, a dead scratch row otherwise -- because a conditional
read-modify-write (`where(slot>=0, x_new, buf[row])`) blocked XLA's
in-place aliasing and copied the whole buffer each iteration (r1 finding).
This probe tests the third option: a `lax.cond` whose false branch is the
identity on the buffer.  If XLA aliases the buffer through both branches,
off-grid iterations (the majority under the ceil(1.3^j)-1 grid) save a
full n-vector write of HBM traffic.

A/B interleaved in one process, medians of 3, diagonal A so storage traffic
dominates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 11_176_960  # lane-aligned ResNet-18 flat dim
MAX_ITER = 50
GRID = (0, 1, 2, 3, 4, 6, 8, 11, 15, 20, 27, 36, 48)  # ceil(1.3^j)-1


def make_solve(variant):
    G = len(GRID)
    slot_of_iter = np.full((MAX_ITER + 1,), -1, np.int32)
    for g, it in enumerate(GRID):
        slot_of_iter[it] = g
    slot_of_iter = jnp.asarray(slot_of_iter)

    d = 1.0 + jnp.arange(N, dtype=jnp.float32) / N  # diagonal A

    @jax.jit
    def solve(b):
        x0 = jnp.zeros_like(b)
        r0 = d * x0 - b
        p0 = -r0
        if variant == "scratch":
            buf = jnp.zeros(((G + 1) * N,), jnp.float32)
        else:
            buf = jnp.zeros((G * N,), jnp.float32)

        def body(carry, _):
            x, r, p, ry_old, it, buf = carry
            Ap = d * p
            alpha = ry_old / jnp.vdot(p, Ap)
            x_new = x + alpha * p
            r_new = r + alpha * Ap
            slot = slot_of_iter[it]
            if variant == "scratch":
                idx = jnp.where(slot >= 0, slot, G)
                buf = jax.lax.dynamic_update_slice(buf, x_new, (idx * N,))
            else:  # cond: skip the store entirely off-grid

                def write(buf):
                    return jax.lax.dynamic_update_slice(
                        buf, x_new, (jnp.maximum(slot, 0) * N,)
                    )

                buf = jax.lax.cond(slot >= 0, write, lambda b: b, buf)
            rr = jnp.vdot(r_new, r_new)
            beta = rr / ry_old
            p_new = -r_new + beta * p
            return (x_new, r_new, p_new, rr, it + 1, buf), None

        init = (x0, r0, p0, jnp.vdot(r0, r0), jnp.asarray(0, jnp.int32), buf)
        (x, _, _, _, _, buf), _ = jax.lax.scan(
            body, init, None, length=MAX_ITER
        )
        return x[0] + buf[0] + buf[-1]  # consume so nothing is DCE'd

    return solve


if __name__ == "__main__":
    solves = {v: make_solve(v) for v in ("scratch", "cond")}
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    bs = [jax.random.normal(k, (N,), jnp.float32) for k in keys]
    for v, s in solves.items():
        float(s(bs[0]))  # compile + warm
    results = {v: [] for v in solves}
    for i in range(1, 4):
        for v, s in solves.items():
            b = bs[2 * i + (0 if v == "scratch" else 1)]
            jax.block_until_ready(b)
            t0 = time.perf_counter()
            out = s(b)
            _ = float(out)
            results[v].append(time.perf_counter() - t0)
    for v, ts in results.items():
        ts.sort()
        med = ts[len(ts) // 2]
        print(
            f"{v}: {med * 1000:.1f} ms total, "
            f"{med / MAX_ITER * 1000:.2f} ms/iter",
            flush=True,
        )
