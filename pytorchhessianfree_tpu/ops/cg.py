"""Preconditioned conjugate gradients as one on-device ``lax.while_loop``.

TPU-native rebuild of the reference CG solver (reference hessianfree/cg.py:9-231),
which minimizes the quadratic ``m(x) = 0.5 x^T A x - b^T x`` via matrix-free
matvecs.  The reference host-syncs every iteration (``.item()`` calls inside
``_terminate_cg``); here the entire solve -- Martens' relative-progress
criterion, the tolerance tests, non-positive-curvature handling and the
iterate-storage grid -- is staged into a single jitted ``lax.while_loop``
with on-device termination flags and zero host round-trips per iteration.

Semantics parity map (reference cg.py line numbers):
- termination order Martens -> max_iter -> NaN -> tolerances (:96-118);
- Martens window ``k = max(10, iter // 10)``, threshold ``5e-4`` (:98-103);
- residual bound ``max(tol * ||b||, atol)`` with strict ``<`` (:75-76, :114);
- storage grid ``ceil(gamma^j) - 1`` (:152-170) becomes a static slot table
  scattered into a preallocated ``[G, n]`` buffer (replacing the ``None``
  holes of the reference's ``x_iters`` list, :187, :210);
- non-positive ``pAp`` options "ignore" / "saddle-free" (:123-147) become a
  returned flag plus a static select (warnings don't compose with jit).
"""

from __future__ import annotations

from math import ceil, gcd, log
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Termination reason codes.  String forms match the reference exactly
# (reference cg.py:103, :107, :111, :115).
REASON_RUNNING = 0
REASON_MARTENS = 1
REASON_MAX_ITER = 2
REASON_DIVERGENCE = 3
REASON_TOLERANCES = 4

CG_REASON_STRINGS = {
    REASON_RUNNING: "Running",
    REASON_MARTENS: "Convergence (Martens)",
    REASON_MAX_ITER: "Number of iterations",
    REASON_DIVERGENCE: "Divergence",
    REASON_TOLERANCES: "Convergence (tolerances)",
}


def cg_reason_str(code: int) -> str:
    """Human-readable termination reason for a reason code."""
    return CG_REASON_STRINGS[int(code)]


def storing_grid(max_iter: int, gamma: float = 1.3) -> Tuple[int, ...]:
    """Static grid of iterations at which CG stores its iterate.

    Includes ``ceil(gamma^j) - 1`` for ``j = 0, 1, ..., j_max`` with
    ``j_max = ceil(log(max_iter + 1) / log(gamma))``, deduplicated and sorted
    (reference cg.py:152-170).  Entries beyond ``max_iter`` are dropped here
    since the loop can never reach them (the reference keeps them in its list
    but likewise never stores at them).
    """
    if gamma <= 1.0:
        raise ValueError(f"Invalid gamma = {gamma}")
    j_max = ceil(log(max_iter + 1) / log(gamma))
    iters = sorted({int(ceil(gamma**j) - 1) for j in range(j_max + 1)})
    return tuple(i for i in iters if i <= max_iter)


class CGResult(NamedTuple):
    """On-device result of a CG solve.

    The reference returns a ragged ``x_iters`` list with ``None`` holes whose
    last entry is always the final iterate (reference cg.py:229-231); here the
    stored iterates live in the static-shaped buffer ``x_buf`` (row ``g``
    corresponds to iteration ``stored_iters[g]``; rows with
    ``stored_iters[g] > num_iters`` were never reached) and the final iterate
    is explicit in ``x``.
    """

    x: jax.Array  # [n] final iterate
    num_iters: jax.Array  # int32, number of CG iterations performed (>= 1)
    reason: jax.Array  # int32 termination code (see CG_REASON_STRINGS)
    x_buf: jax.Array  # [G, n] iterates stored at the grid iterations
    stored_iters: Tuple[int, ...]  # static; iteration number per buffer row
    m_hist: jax.Array  # [max_iter + 1] quadratic values m(x_i); valid 0..num_iters
    nonpos_pAp: jax.Array  # bool, non-positive directional curvature detected
    # Flat storage alias of ``x_buf`` (``buffer_layout="flat"`` only).  Row
    # reads in the backtracking/line-search paths go through :meth:`row` so
    # the 2-D [G, n] view is never materialized on TPU: XLA assigns [G, n]
    # a T(8,128) tiled layout whose sublane dim pads G up to a multiple of
    # 8 (13 grid rows -> 16 = 1.2x of a grid that IS most of solver HBM),
    # and at 150M params the padded copy plus XLA's remat-compressed twin
    # doubled peak memory (measured 27.5 GB for a 12.8 GB solver,
    # benchmarks/memory_audit.py).
    #
    # Shape: ``[rows*n // chunk, chunk]`` with ``chunk = gcd(n, 1024)``
    # (``[rows*n]`` 1-D when the chunk degenerates to 1).  The chunked form
    # exists because row starts are computed as ``jc * rows_per_slot`` in
    # jax's default int32: a direct ``jc * n`` overflows 2**31 once
    # ``rows * n`` exceeds ~2.1e9 elements (>= ~165M params at the 13-row
    # cg50 grid) and silently reads the wrong iterate.  With chunk 1024 the
    # multiplier shrinks 1024x (safe to ~8 TB of grid) and the minor dim
    # stays exactly lane-aligned, so the layout is tile-identical to the
    # natural 1-D T(1024) form.
    x_buf_flat: Optional[jax.Array] = None

    def row(self, jc) -> jax.Array:
        """Stored iterate for (clamped) buffer row ``jc``, read from the
        flat buffer when available (no [G, n] materialization)."""
        if self.x_buf_flat is not None:
            n = self.x.shape[0]
            buf = self.x_buf_flat
            if buf.ndim == 2:
                chunk = buf.shape[1]
                start = jnp.asarray(jc) * (n // chunk)
                return jax.lax.dynamic_slice(
                    buf,
                    (start, jnp.zeros((), start.dtype)),
                    (n // chunk, chunk),
                ).reshape(n)
            return jax.lax.dynamic_slice(
                buf, (jc * n,), (n,)
            )
        return self.x_buf[jc]

    @property
    def m_final(self) -> jax.Array:
        """``m_iters[-1]`` of the reference: quadratic value at termination."""
        return self.m_hist[self.num_iters]

    def reached(self) -> jax.Array:
        """[G] bool mask: buffer rows actually filled before termination."""
        iters = jnp.asarray(self.stored_iters, jnp.int32)
        return iters <= self.num_iters


def cg(
    A: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    max_iter: Optional[int] = None,
    tol: float = 1e-5,
    atol: Optional[float] = None,
    martens_conv_crit: bool = False,
    store_x_at_iters: Optional[Sequence[int]] = (),
    grid_gamma: float = 1.3,
    martens_threshold: float = 5e-4,
    martens_min_window: int = 10,
    nonpos_curv_option: str = "ignore",
    store_dtype=None,
    buffer_layout: str = "flat",
    store_mode: str = "cond",
    shard_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_buf: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> CGResult:
    """Preconditioned CG for ``A x = b`` with Hessian-free modifications.

    Drop-in functional analog of the reference ``cg``
    (reference cg.py:9-231).  ``A`` and ``M`` are matrix-free matvec closures
    (they may close over traced values, e.g. a linearized model).  This
    function is meant to be traced inside an enclosing ``jax.jit``; it builds
    one ``lax.while_loop`` whose body performs exactly one curvature matvec.

    Args:
        A: s.p.d. matvec ``x -> A @ x``.
        b: right-hand side, flat ``[n]`` vector.
        x0: warm start (zeros if ``None``, reference cg.py:178).
        M: preconditioner matvec approximating ``A^{-1}`` (identity if None).
        max_iter: static iteration cap; ``n`` if None (reference cg.py:177).
        tol, atol: terminate when ``||r|| < max(tol * ||b||, atol)``.
        martens_conv_crit: enable Martens' relative-progress criterion.
        store_x_at_iters: iterations at which to store the iterate.  ``None``
            selects the automatic ``ceil(gamma^j) - 1`` grid; the empty tuple
            stores nothing besides the explicit final ``x``.
        nonpos_curv_option: "ignore" or "saddle-free" (reference cg.py:123-147).
        shard_vec: optional sharding-constraint hook (e.g.
            ``lax.with_sharding_constraint`` to a model-axis ``NamedSharding``)
            applied to every ``[n]`` vector carried through the loop (iterate,
            residual, search direction).  Identity when ``None``.  Used by
            :func:`~pytorchhessianfree_tpu.parallel.make_sharded_hf_step` to
            keep the whole CG vector space sharded across a device mesh.
        shard_buf: same, for the iterate-storage buffer (its largest array).
            The buffer's shape depends on ``buffer_layout``: ``"rows"``
            passes a ``[rows, n]`` array (shard the last axis; ``rows`` is
            ``G`` under the default ``store_mode="cond"``, ``G+1`` with the
            scratch row), ``"flat"`` a ``[rows*n // chunk, chunk]`` array
            (``chunk = gcd(n, 1024)``; degenerates to 1-D ``[rows*n]`` when
            the chunk is 1) -- a PartitionSpec written for the ``"rows"``
            shape will fail inside the trace with the flat layout.  The
            ``parallel.sharded`` builders force ``"rows"`` for exactly this
            reason.
    """
    if nonpos_curv_option not in ("ignore", "saddle-free"):
        raise ValueError(f"Unknown option {nonpos_curv_option}.")
    if buffer_layout not in ("flat", "rows"):
        raise ValueError(f"Unknown buffer_layout {buffer_layout}")
    if store_mode not in ("scratch", "cond"):
        raise ValueError(f"Unknown store_mode {store_mode}")
    sv = shard_vec if shard_vec is not None else (lambda v: v)
    sb = shard_buf if shard_buf is not None else (lambda v: v)

    n = b.shape[0]
    dtype = b.dtype
    max_iter = int(n if max_iter is None else max_iter)

    if store_x_at_iters is None:
        stored_iters = storing_grid(max_iter, grid_gamma)
    else:
        stored_iters = tuple(
            sorted({int(i) for i in store_x_at_iters if 0 <= int(i) <= max_iter})
        )
    G = len(stored_iters)

    # Static iteration -> buffer-slot table (-1 = not stored).
    slot_of_iter = np.full((max_iter + 1,), -1, np.int32)
    for g, it in enumerate(stored_iters):
        slot_of_iter[it] = g
    slot_of_iter = jnp.asarray(slot_of_iter)

    x0 = sv(jnp.zeros_like(b) if x0 is None else x0.astype(dtype))

    # Tolerance-based residual bound (reference cg.py:75-76).
    res_bound = tol * jnp.linalg.norm(b)
    if atol is not None:
        res_bound = jnp.maximum(res_bound, jnp.asarray(atol, dtype))

    def apply_M(r):
        return M(r) if M is not None else r

    # Initialization (reference cg.py:186-192).
    r0 = sv(A(x0) - b)
    m0 = 0.5 * jnp.vdot(r0 - b, x0)
    m_hist = jnp.zeros((max_iter + 1,), dtype).at[0].set(m0)
    y0 = apply_M(r0)
    ry0 = jnp.vdot(r0, y0)
    p0 = sv(-y0)

    # Iterate storage layout, tuned from v5e profiles of an 11M-param model:
    #
    # - FLAT [rows * n] buffer, not [rows, n]: writing a 1-D vector into a
    #   row of a 2-D buffer whose row length is not lane-aligned forces a
    #   re-tiling copy (~2.6 ms/iter observed); a 1-D dynamic_update_slice
    #   at offset idx*n is layout-identical and aliases in place.
    # - store_mode="cond" (default): off-grid iterations SKIP the store
    #   through a lax.cond whose false branch is the identity -- one fewer
    #   n-vector HBM write on the (majority) off-grid iterations, measured
    #   16% faster full steps in-process with bit-identical results.
    #   store_mode="scratch" writes every iterate (off-grid ones into a
    #   dead scratch row at slot G), keeping the scatter read-free.  The
    #   one FORBIDDEN form is a conditional read-modify-write
    #   (where(slot>=0, x_new, buf[row])): it blocks XLA's in-place
    #   aliasing and copies the whole buffer every iteration.
    #   Measurements in BENCH_DETAILS.md.
    # - Optional reduced-precision storage (``store_dtype``) halves the
    #   buffer traffic; backtracking casts candidates back on read.
    sdtype = jnp.dtype(store_dtype) if store_dtype is not None else dtype
    rows = G + 1 if store_mode == "scratch" else max(G, 1)
    # chunk > 1 stores the flat buffer as [rows*n//chunk, chunk] so the
    # runtime row-start multiply stays far inside int32 range (see the
    # CGResult.x_buf_flat comment); gcd keeps the transform exact for any
    # n, and the lane-aligned padded space (pad_to_multiple=1024) always
    # gets the full 1024-wide chunk.
    chunk = gcd(n, 1024) if buffer_layout == "flat" else 1
    if buffer_layout == "flat":
        # The runtime row-start multiply is idx * (n // chunk) in jax's
        # default int32; it silently wraps once the buffer's leading dim
        # rows * (n // chunk) reaches 2**31 -- for ANY chunk, not just the
        # degenerate chunk == 1 (e.g. chunk=2 wraps at ~330M params x 13
        # grid rows).  Refuse loudly instead of corrupting iterates.
        if rows * (n // chunk) >= 2**31:
            raise ValueError(
                f"buffer_layout='flat' with flat dim {n} (chunk {chunk}) "
                f"and {rows} grid rows needs row offsets >= 2**31, which "
                "overflows jax's default int32 index arithmetic.  Pad the "
                "vector space (TrainableRavel(pad_to_multiple=1024)) or "
                "use buffer_layout='rows'."
            )
        if chunk > 1:
            x_buf = jnp.zeros((rows * n // chunk, chunk), sdtype)
            if G and stored_iters[0] == 0:
                x_buf = jax.lax.dynamic_update_slice(
                    x_buf, x0.astype(sdtype).reshape(-1, chunk), (0, 0)
                )
        else:
            x_buf = jnp.zeros((rows * n,), sdtype)
            if G and stored_iters[0] == 0:
                x_buf = jax.lax.dynamic_update_slice(
                    x_buf, x0.astype(sdtype), (0,)
                )
    else:  # "rows"
        x_buf = jnp.zeros((rows, n), sdtype)
        if G and stored_iters[0] == 0:
            x_buf = x_buf.at[0].set(x0.astype(sdtype))
    x_buf = sb(x_buf)

    def _flat_write(buf, idx, vec):
        # 1-D/chunked dynamic update at row ``idx`` (flat layout only).
        if chunk > 1:
            start = jnp.asarray(idx) * (n // chunk)
            return jax.lax.dynamic_update_slice(
                buf,
                vec.reshape(-1, chunk),
                (start, jnp.zeros((), start.dtype)),
            )
        return jax.lax.dynamic_update_slice(buf, vec, (idx * n,))

    def cond(carry):
        return jnp.logical_not(carry[7])

    def body(carry):
        x, r, p, ry_old, it, m_hist, x_buf, _done, _reason, nonpos = carry

        # One curvature matvec per iteration -- the hot op (reference cg.py:205).
        Ap = sv(A(p))
        pAp_raw = jnp.vdot(p, Ap)
        nonpos_i = pAp_raw <= 0
        if nonpos_curv_option == "saddle-free":
            pAp = jnp.abs(pAp_raw)
        else:
            pAp = pAp_raw
        alpha = ry_old / pAp

        x_new = sv(x + alpha * p)
        r_new = sv(r + alpha * Ap)
        # Quadratic value m(x) tracked as 0.5 (r - b) . x
        # (reference cg.py:97).
        m = 0.5 * jnp.vdot(r_new - b, x_new)
        if M is None:
            # Unpreconditioned: r.r serves both the residual norm and
            # ry_new below (||r|| = sqrt(r.r) exactly, same reduction as
            # linalg.norm) -- one fewer HBM pass per iteration.
            rr = jnp.vdot(r_new, r_new)
            res_norm = jnp.sqrt(rr)
        else:
            res_norm = jnp.linalg.norm(r_new)

        # Scatter the iterate into its grid slot; off-grid iterations write
        # the scratch row or skip the store per store_mode (the reference
        # appends None off-grid, cg.py:209-210).
        if G:
            slot = slot_of_iter[it]
            if store_mode == "scratch":
                idx = jnp.where(slot >= 0, slot, G)
                if buffer_layout == "flat":
                    x_buf = _flat_write(x_buf, idx, x_new.astype(sdtype))
                else:
                    x_buf = x_buf.at[idx].set(x_new.astype(sdtype))
            else:  # "cond"
                idx = jnp.maximum(slot, 0)

                if buffer_layout == "flat":

                    def write(buf):
                        return _flat_write(buf, idx, x_new.astype(sdtype))

                else:

                    def write(buf):
                        return buf.at[idx].set(x_new.astype(sdtype))

                x_buf = jax.lax.cond(
                    slot >= 0, write, lambda buf: buf, x_buf
                )
            x_buf = sb(x_buf)

        m_hist = m_hist.at[it].set(m)

        # Termination tests, in reference priority order (reference cg.py:96-118).
        if martens_conv_crit:
            k = jnp.maximum(martens_min_window, it // 10)
            m_lag = m_hist[jnp.maximum(it - k, 0)]
            martens = (k < it) & ((m - m_lag) / (m - m_hist[0]) < martens_threshold)
        else:
            martens = jnp.asarray(False)
        maxed = it >= max_iter
        diverged = jnp.isnan(res_norm)
        within_tol = res_norm < res_bound

        reason = jnp.where(
            martens,
            REASON_MARTENS,
            jnp.where(
                maxed,
                REASON_MAX_ITER,
                jnp.where(
                    diverged,
                    REASON_DIVERGENCE,
                    jnp.where(within_tol, REASON_TOLERANCES, REASON_RUNNING),
                ),
            ),
        ).astype(jnp.int32)
        done = martens | maxed | diverged | within_tol

        # Next search direction (reference cg.py:220-224); harmless garbage on
        # the final iteration since the loop exits before it is used.
        if M is None:
            y = r_new
            ry_new = rr  # reuse the residual dot computed above
        else:
            y = apply_M(r_new)
            ry_new = jnp.vdot(r_new, y)
        beta = ry_new / ry_old
        p_new = sv(-y + beta * p)

        return (
            x_new,
            r_new,
            p_new,
            ry_new,
            it + 1,
            m_hist,
            x_buf,
            done,
            reason,
            nonpos | nonpos_i,
        )

    init = (
        x0,
        r0,
        p0,
        ry0,
        jnp.asarray(1, jnp.int32),
        m_hist,
        x_buf,
        jnp.asarray(False),
        jnp.asarray(REASON_RUNNING, jnp.int32),
        jnp.asarray(False),
    )
    x, _r, _p, _ry, it, m_hist, x_buf, _done, reason, nonpos = jax.lax.while_loop(
        cond, body, init
    )

    return CGResult(
        x=x,
        num_iters=it - 1,
        reason=reason,
        # drop the scratch row (+ unflatten), one reshape outside the loop;
        # dead code unless a consumer actually wants the 2-D view (the
        # backtracking/line-search paths read rows via ``row`` instead)
        x_buf=(
            x_buf.reshape(-1)[: G * n].reshape(G, n)
            if buffer_layout == "flat"
            else x_buf[:G]
        ),
        stored_iters=stored_iters,
        m_hist=m_hist,
        nonpos_pAp=nonpos,
        # drop the scratch row (if any); keeps the chunked/1-D shape
        x_buf_flat=(
            x_buf[: G * (n // chunk)]
            if buffer_layout == "flat"
            else None
        ),
    )
