"""Update-step selection: CG-backtracking and the Armijo line search.

TPU-native rebuild of reference ``hessianfree/cg_backtracking.py`` and
``hessianfree/linesearch.py``.  Both routines repeatedly evaluate a target
function ``f(step) -> loss`` (the reference's ``tfunc`` closure that writes
trial parameters into the live model, reference optimizer.py:288-294); here
``f`` is a pure traced function and the sequential early-exit loops become
bounded ``lax.while_loop``s inside the enclosing jitted optimizer step --
no host round-trips between trial evaluations.

Each routine also has a "batched" variant that evaluates every candidate in
one ``vmap``-ed forward sweep and then applies the *identical* selection rule
on-device.  For backtracking the batched variant reproduces the early-exit
walk's choice exactly (it merely evaluates candidates the sequential walk
would have skipped); for the line search the selected alpha is the largest
candidate satisfying the Armijo condition in both modes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .cg import CGResult


class BacktrackResult(NamedTuple):
    best_iter: jax.Array  # int32: CG iteration number of the chosen step
    step: jax.Array  # [n] the chosen update step
    f_best: jax.Array  # loss at the chosen step
    # loss at the FINAL CG iterate (always the first candidate evaluated);
    # the LM damping heuristic needs exactly this value (reference
    # optimizer.py:303 tfunc(x_iters[-1])), so exposing it saves a forward
    f_final: jax.Array


class LinesearchResult(NamedTuple):
    alpha: jax.Array  # chosen step size (0.0 on failure)
    f_alpha: jax.Array  # loss at alpha * step (f(0) on failure)
    failed: jax.Array  # bool: no alpha satisfied the Armijo condition
    not_descent: jax.Array  # bool: step is not a descent direction


def _candidates(cgres: CGResult):
    """Candidate table for backtracking over a CG result.

    Candidate index ``j in [0, G]``: ``j < G`` refers to buffer row ``j``
    (iteration ``stored_iters[j]``); ``j == G`` is the final iterate.  A
    buffer row is a valid candidate only if its iteration is strictly below
    ``num_iters`` -- rows at or beyond the final iteration are either
    duplicates of the final iterate or were never reached (the reference's
    ``None`` holes, reference cg_backtracking.py:85-86).
    """
    G = len(cgres.stored_iters)
    iters_arr = jnp.asarray(cgres.stored_iters or (0,), jnp.int32)
    return G, iters_arr


def cg_efficient_backtracking(
    f: Callable[[jax.Array], jax.Array],
    cgres: CGResult,
    mode: str = "sequential",
) -> BacktrackResult:
    """Reverse-walk the stored CG iterates, stopping at the first
    non-improvement.

    Exact semantics of ``cg_efficient_backtracking``
    (reference cg_backtracking.py:53-112): start from the final iterate with
    ``f_min = inf`` (so the final iterate is always evaluated and becomes the
    initial best), walk towards iteration 0, keep going while ``f`` strictly
    improves, and return the best *observed* candidate -- which is not
    necessarily the global argmin.
    """
    G, iters_arr = _candidates(cgres)

    def step_at(j):
        """Candidate step vector for candidate index j (j == G -> final)."""
        if G == 0:
            return cgres.x
        jc = jnp.minimum(j, G - 1)
        # stored iterates may be kept reduced-precision (cg store_dtype)
        return jnp.where(j == G, cgres.x, cgres.x_buf[jc].astype(cgres.x.dtype))

    def valid_at(j):
        if G == 0:
            return j == G
        jc = jnp.minimum(j, G - 1)
        return (j == G) | (iters_arr[jc] < cgres.num_iters)

    inf = jnp.asarray(jnp.inf, cgres.x.dtype)

    if mode == "batched":
        stacked = jnp.concatenate(
            [cgres.x_buf.astype(cgres.x.dtype), cgres.x[None]], axis=0
        )
        f_vals = jax.vmap(f)(stacked)  # one batched sweep over all candidates
        f_final = f_vals[G]

        def walk(j, carry):
            best, fmin, done = carry
            idx = G - j  # reverse order: final candidate first
            valid = valid_at(idx)
            fj = jnp.where(valid, f_vals[jnp.minimum(idx, G)], inf)
            raw_improved = fj < fmin  # against the pre-update running minimum
            improved = valid & jnp.logical_not(done) & raw_improved
            newly_done = valid & jnp.logical_not(done) & jnp.logical_not(raw_improved)
            best = jnp.where(improved, idx, best)
            fmin = jnp.where(improved, fj, fmin)
            done = done | newly_done
            return best, fmin, done

        best, fmin, _ = jax.lax.fori_loop(
            0, G + 1, walk, (jnp.asarray(G, jnp.int32), inf, jnp.asarray(False))
        )
    else:
        # Candidate G (the final iterate) is always evaluated first with
        # f_min = inf, so it unconditionally becomes the initial best
        # (reference cg_backtracking.py:80-95).  Its value is captured from
        # the first loop trip (f_at_G carry slot) so the optimizer can reuse
        # it for the LM heuristic without a second trace of `f`.
        def cond(carry):
            j, _best, _fmin, done, _f_at_G = carry
            return jnp.logical_not(done) & (j >= 0)

        def body(carry):
            j, best, fmin, done, f_at_G = carry
            valid = valid_at(j)
            fj = jax.lax.cond(valid, f, lambda s: inf, step_at(j))
            f_at_G = jnp.where(j == G, fj, f_at_G)
            improved = fj < fmin
            best = jnp.where(valid & improved, j, best)
            fmin = jnp.where(valid & improved, fj, fmin)
            done = done | (valid & jnp.logical_not(improved))
            return j - 1, best, fmin, done, f_at_G

        _, best, fmin, _, f_final = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(G, jnp.int32),
                jnp.asarray(G, jnp.int32),
                inf,
                jnp.asarray(False),
                inf,
            ),
        )

    best_iter = (
        jnp.where(
            best == G,
            cgres.num_iters,
            iters_arr[jnp.minimum(best, max(G - 1, 0))],
        )
        if G
        else cgres.num_iters
    )
    return BacktrackResult(
        best_iter=best_iter.astype(jnp.int32),
        step=step_at(best),
        f_best=fmin,
        f_final=f_final,
    )


def cg_backtracking(
    f: Callable[[jax.Array], jax.Array], cgres: CGResult
) -> BacktrackResult:
    """Exhaustive variant: global argmin over all stored iterates.

    Analog of ``cg_backtracking`` (reference cg_backtracking.py:6-50), which
    evaluates every candidate (``None`` holes count as ``inf``).  Evaluated as
    one batched sweep -- the natural TPU formulation.
    """
    G, iters_arr = _candidates(cgres)
    stacked = jnp.concatenate(
        [cgres.x_buf.astype(cgres.x.dtype), cgres.x[None]], axis=0
    )
    f_vals = jax.vmap(f)(stacked)
    if G:
        valid = jnp.concatenate(
            [iters_arr < cgres.num_iters, jnp.ones((1,), bool)]
        )
    else:
        valid = jnp.ones((1,), bool)
    masked = jnp.where(valid, f_vals, jnp.inf)
    best = jnp.argmin(masked).astype(jnp.int32)
    best_iter = (
        jnp.where(
            best == G,
            cgres.num_iters,
            iters_arr[jnp.minimum(best, max(G - 1, 0))],
        )
        if G
        else cgres.num_iters
    )
    step = stacked[best]
    return BacktrackResult(
        best_iter=best_iter.astype(jnp.int32),
        step=step,
        f_best=masked[best],
        f_final=f_vals[G],
    )


def simple_linesearch(
    f: Callable[[jax.Array], jax.Array],
    f_grad_0: jax.Array,
    step: jax.Array,
    f_0: jax.Array,
    init_alpha: float = 1.0,
    beta: float = 0.8,
    c: float = 1e-2,
    max_iter: int = 20,
    mode: str = "sequential",
    batch_chunk: Optional[int] = None,
) -> LinesearchResult:
    """Armijo backtracking line search (reference linesearch.py:8-103).

    Starting from ``alpha = init_alpha``, accept the first alpha with
    ``f(alpha * step) <= f(0) + alpha * c * (grad . step)``; otherwise shrink
    by ``beta``.  After ``max_iter`` failed checks, fall back to
    ``(0.0, f(0))`` -- i.e. no update (reference linesearch.py:99-103).

    Unlike the reference, ``f_0 = f(0)`` must be supplied by the caller (the
    optimizer already knows the current-batch loss, so re-evaluating it would
    waste a forward pass; the value is bit-identical).

    The "batched" mode evaluates all ``max_iter`` candidate alphas in one
    vmapped sweep and picks the largest satisfying alpha -- the same choice
    the sequential loop makes.  ``batch_chunk=k`` caps the sweep's memory
    (k trial parameter sets live at once instead of max_iter) by scanning
    vmapped chunks of k candidates -- the same selection, bounded memory.
    """
    if beta >= 1.0:
        raise ValueError(f"Invalid reduction factor beta = {beta}")
    if c < 0.0:
        raise ValueError(f"Invalid c = {c}")

    dtype = step.dtype
    c_dir = c * jnp.vdot(f_grad_0, step)
    not_descent = c_dir >= 0  # reference warns here (linesearch.py:72-75)

    if mode == "batched":
        alphas = init_alpha * (beta ** jnp.arange(max_iter, dtype=dtype))
        if batch_chunk is None or batch_chunk >= max_iter:
            f_vals = jax.vmap(lambda a: f(a * step))(alphas)
        else:
            k = int(batch_chunk)
            pad = (-max_iter) % k
            # padded alphas re-evaluate the last candidate; discarded below
            alphas_p = jnp.concatenate([alphas, jnp.full((pad,), alphas[-1])])
            f_chunks = jax.lax.map(
                lambda ac: jax.vmap(lambda a: f(a * step))(ac),
                alphas_p.reshape(-1, k),
            )
            f_vals = f_chunks.reshape(-1)[:max_iter]
        accepts = f_vals <= f_0 + alphas * c_dir
        any_ok = jnp.any(accepts)
        first = jnp.argmax(accepts)  # smallest index = largest alpha
        alpha = jnp.where(any_ok, alphas[first], jnp.asarray(0.0, dtype))
        f_alpha = jnp.where(any_ok, f_vals[first], f_0)
        return LinesearchResult(alpha, f_alpha, jnp.logical_not(any_ok), not_descent)

    # One `f` trace: each loop trip evaluates the current alpha, checks the
    # Armijo condition and shrinks on failure.  The sequence of evaluated
    # alphas and the accepted (alpha, f) pair are identical to the
    # reference's evaluate-ahead loop (linesearch.py:61-97); the only
    # difference is that the reference wastes one final evaluation in the
    # total-failure case.
    def cond(carry):
        _alpha, _f_alpha, i, accepted = carry
        return jnp.logical_not(accepted) & (i < max_iter)

    def body(carry):
        alpha, _f_alpha, i, _ = carry
        fa = f(alpha * step)
        accept = fa <= f_0 + alpha * c_dir
        new_alpha = jnp.where(accept, alpha, alpha * beta)
        return new_alpha, fa, i + 1, accept

    alpha, f_alpha, _, accepted = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(init_alpha, dtype),
            jnp.asarray(jnp.nan, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        ),
    )
    alpha = jnp.where(accepted, alpha, jnp.asarray(0.0, dtype))
    f_alpha = jnp.where(accepted, f_alpha, f_0)
    return LinesearchResult(alpha, f_alpha, jnp.logical_not(accepted), not_descent)
