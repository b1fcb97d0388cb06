"""A/B probe: CG iterate-buffer layout ('flat' vs 'rows') on the live device.

Run ``python benchmarks/ab_buffer_layout.py flat`` then ``... rows``; each
invocation appends its median to /tmp/ab_buffer_layout.txt.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pytorchhessianfree_tpu import TrainableRavel
from pytorchhessianfree_tpu.models import (
    cross_entropy_loss,
    init_resnet18,
    resnet18_apply,
)
from pytorchhessianfree_tpu.ops.cg import cg
from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

layout = sys.argv[1]
key = jax.random.PRNGKey(0)
params = init_resnet18(key, 10, 1)
ravel = TrainableRavel(params)
kx, ky = jax.random.split(key)
x = jax.random.normal(kx, (32, 28, 28, 1), jnp.float32)
y = jax.random.randint(ky, (32,), 0, 10)


@jax.jit
def run(params, b):
    _, _, _, gv = ggnvp_fn(
        lambda p: resnet18_apply(p, x),
        lambda o: cross_entropy_loss(o, y),
        params,
    )
    A = lambda v: ravel.ravel(gv(ravel.unravel(v))) + 1.0 * v
    res = cg(
        A,
        b,
        max_iter=50,
        tol=0.0,
        martens_conv_crit=False,
        store_x_at_iters=None,
        buffer_layout=layout,
    )
    # consume x_buf so storage is not dead-code-eliminated
    return res.x, jnp.sum(res.x_buf[:, 0])


def bvec(i):
    v = jax.random.normal(jax.random.PRNGKey(50 + i), (ravel.dim,), jnp.float32)
    return v / jnp.linalg.norm(v)


float(run(params, bvec(0))[0][0])  # compile
ts = []
for i in range(1, 6):
    b = bvec(i)
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    xo, sb = run(params, b)
    float(xo[0])
    float(sb)
    ts.append(time.perf_counter() - t0)
ts.sort()
line = "%s: median %.3fs over 50 iters -> %.2f ms/iter (all: %s)" % (
    layout,
    ts[len(ts) // 2],
    1000 * ts[len(ts) // 2] / 50,
    [round(t, 3) for t in ts],
)
print(line)
with open("/tmp/ab_buffer_layout.txt", "a") as f:
    f.write(line + "\n")
