"""Pallas TPU kernels for the CG iteration's bandwidth-bound vector phase.

Each CG iteration does, besides the curvature matvec (reference cg.py:205):
``x += alpha p``, ``r += alpha Ap``, the quadratic value
``m = 0.5 (r - b) . x`` and the residual norm (reference cg.py:207-214).
Issued as separate XLA ops these make ~6 HBM passes over n-vectors; the
fused kernel below performs the two AXPYs and both reductions in a single
pass (reads x, r, p, Ap, b once; writes x', r'; emits the two scalars),
cutting the vector-phase HBM traffic roughly in half.  For an 11M-parameter
model that phase is ~5-10% of an iteration (the matvec dominates), so this
is an opt-in optimization (`CGConfig.use_fused_kernel`) rather than the
default path.

The flat vector is viewed as ``(rows, 128)`` lane-tiles and the grid walks
row-blocks; scalar accumulators live in SMEM and exploit the sequential
grid-iteration order of TPU Pallas.  Zero-padding to the tile size is
harmless: padded lanes contribute 0 to every output.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU/interpret-only; import lazily-guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

_LANES = 128
_BLOCK_ROWS = 256  # 256 x 128 f32 = 128 KiB per operand block in VMEM


def _pad_to_tiles(v: jax.Array) -> Tuple[jax.Array, int]:
    n = v.shape[0]
    tile = _LANES * 8
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        v = jnp.pad(v, (0, padded - n))
    return v.reshape(-1, _LANES), n


def _fused_update_kernel(
    alpha_ref, x_ref, r_ref, p_ref, ap_ref, b_ref, xo_ref, ro_ref, m_ref, rr_ref
):
    i = pl.program_id(0)
    a = alpha_ref[0]
    xn = x_ref[:] + a * p_ref[:]
    rn = r_ref[:] + a * ap_ref[:]
    xo_ref[:] = xn
    ro_ref[:] = rn
    m_part = 0.5 * jnp.sum((rn - b_ref[:]) * xn)
    rr_part = jnp.sum(rn * rn)

    @pl.when(i == 0)
    def _init():
        m_ref[0, 0] = m_part
        rr_ref[0, 0] = rr_part

    @pl.when(i > 0)
    def _acc():
        m_ref[0, 0] += m_part
        rr_ref[0, 0] += rr_part


def fused_cg_update(
    x: jax.Array,
    r: jax.Array,
    p: jax.Array,
    Ap: jax.Array,
    b: jax.Array,
    alpha: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One-pass CG iterate update.

    Returns ``(x_new, r_new, m, rr)`` with ``x_new = x + alpha p``,
    ``r_new = r + alpha Ap``, ``m = 0.5 (r_new - b) . x_new`` and
    ``rr = r_new . r_new`` (so ``||r_new|| = sqrt(rr)``).
    """
    if not HAS_PALLAS:
        raise RuntimeError("Pallas is unavailable on this platform.")
    n = x.shape[0]
    dtype = x.dtype

    x2, _ = _pad_to_tiles(x)
    r2, _ = _pad_to_tiles(r)
    p2, _ = _pad_to_tiles(p)
    ap2, _ = _pad_to_tiles(Ap)
    b2, _ = _pad_to_tiles(b)
    rows = x2.shape[0]
    block_rows = min(_BLOCK_ROWS, rows)
    # grid must tile the rows exactly; shrink the block if needed
    while rows % block_rows:
        block_rows //= 2
    grid = (rows // block_rows,)

    vec_spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scalar_out_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )

    alpha_arr = jnp.asarray(alpha, dtype).reshape(1)

    xo, ro, m, rr = pl.pallas_call(
        _fused_update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
        ],
        out_specs=(vec_spec, vec_spec, scalar_out_spec, scalar_out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, dtype),
            jax.ShapeDtypeStruct(x2.shape, dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        interpret=interpret,
    )(alpha_arr, x2, r2, p2, ap2, b2)

    return (
        xo.reshape(-1)[:n],
        ro.reshape(-1)[:n],
        m[0, 0],
        rr[0, 0],
    )


def fused_cg_update_reference(x, r, p, Ap, b, alpha):
    """Plain-XLA reference implementation (the default CG path's math)."""
    xn = x + alpha * p
    rn = r + alpha * Ap
    m = 0.5 * jnp.vdot(rn - b, xn)
    rr = jnp.vdot(rn, rn)
    return xn, rn, m, rr
