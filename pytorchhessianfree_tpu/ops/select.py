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
    # [G+1] loss per candidate (slot G = final iterate); NaN where the
    # early-exit walk never evaluated -- the on-device record behind the
    # reference's backtracking table (reference cg_backtracking.py:100-110)
    f_vals: jax.Array


class LinesearchResult(NamedTuple):
    alpha: jax.Array  # chosen step size (0.0 on failure)
    f_alpha: jax.Array  # loss at alpha * step (f(0) on failure)
    failed: jax.Array  # bool: no alpha satisfied the Armijo condition
    not_descent: jax.Array  # bool: step is not a descent direction
    # [max_iter] candidate step sizes and their losses; NaN where the
    # sequential loop exited before trying -- the on-device record behind
    # the reference's line-search trace (reference linesearch.py:57-102)
    alphas: jax.Array
    f_trace: jax.Array


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
        # stored iterates may be kept reduced-precision (cg store_dtype);
        # row() reads the flat buffer -- no [G, n] materialization on TPU
        return jnp.where(j == G, cgres.x, cgres.row(jc).astype(cgres.x.dtype))

    def valid_at(j):
        if G == 0:
            return j == G
        jc = jnp.minimum(j, G - 1)
        return (j == G) | (iters_arr[jc] < cgres.num_iters)

    inf = jnp.asarray(jnp.inf, cgres.x.dtype)
    nan = jnp.asarray(jnp.nan, cgres.x.dtype)

    if mode == "batched":
        stacked = jnp.concatenate(
            [cgres.x_buf.astype(cgres.x.dtype), cgres.x[None]], axis=0
        )
        f_vals = jax.vmap(f)(stacked)  # one batched sweep over all candidates
        f_final = f_vals[G]
        valid_all = jax.vmap(valid_at)(jnp.arange(G + 1))
        f_record = jnp.where(valid_all, f_vals, nan)

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
            j, _best, _fmin, done, _f_at_G, _rec = carry
            return jnp.logical_not(done) & (j >= 0)

        def body(carry):
            j, best, fmin, done, f_at_G, rec = carry
            valid = valid_at(j)
            fj = jax.lax.cond(valid, f, lambda s: inf, step_at(j))
            rec = rec.at[j].set(jnp.where(valid, fj, nan))
            f_at_G = jnp.where(j == G, fj, f_at_G)
            improved = fj < fmin
            best = jnp.where(valid & improved, j, best)
            fmin = jnp.where(valid & improved, fj, fmin)
            done = done | (valid & jnp.logical_not(improved))
            return j - 1, best, fmin, done, f_at_G, rec

        _, best, fmin, _, f_final, f_record = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(G, jnp.int32),
                jnp.asarray(G, jnp.int32),
                inf,
                jnp.asarray(False),
                inf,
                jnp.full((G + 1,), nan),
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
        f_vals=f_record,
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
        f_vals=jnp.where(valid, f_vals, jnp.nan),
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
    if max_iter < 1:
        raise ValueError(f"Invalid line-search max_iter {max_iter}")

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
        return LinesearchResult(
            alpha, f_alpha, jnp.logical_not(any_ok), not_descent,
            alphas=alphas, f_trace=f_vals,
        )

    # One `f` trace: each loop trip evaluates the current alpha, checks the
    # Armijo condition and shrinks on failure.  The sequence of evaluated
    # alphas and the accepted (alpha, f) pair are identical to the
    # reference's evaluate-ahead loop (linesearch.py:61-97); the only
    # difference is that the reference wastes one final evaluation in the
    # total-failure case.
    def cond(carry):
        _alpha, _f_alpha, i, accepted, _at, _ft = carry
        return jnp.logical_not(accepted) & (i < max_iter)

    def body(carry):
        alpha, _f_alpha, i, _, a_trace, f_trace = carry
        fa = f(alpha * step)
        a_trace = a_trace.at[i].set(alpha)
        f_trace = f_trace.at[i].set(fa)
        accept = fa <= f_0 + alpha * c_dir
        new_alpha = jnp.where(accept, alpha, alpha * beta)
        return new_alpha, fa, i + 1, accept, a_trace, f_trace

    nan_trace = jnp.full((max_iter,), jnp.nan, dtype)
    alpha, f_alpha, _, accepted, a_trace, f_trace = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(init_alpha, dtype),
            jnp.asarray(jnp.nan, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            nan_trace,
            nan_trace,
        ),
    )
    alpha = jnp.where(accepted, alpha, jnp.asarray(0.0, dtype))
    f_alpha = jnp.where(accepted, f_alpha, f_0)
    return LinesearchResult(
        alpha, f_alpha, jnp.logical_not(accepted), not_descent,
        alphas=a_trace, f_trace=f_trace,
    )


class FusedTrialsResult(NamedTuple):
    """Result of :func:`fused_trials` -- everything the optimizer's
    trial-evaluation phases produce, from ONE while_loop."""

    step: jax.Array  # [n] chosen update step (backtracked)
    best_iter: jax.Array  # int32 CG iteration of the chosen step
    f_final: jax.Array  # loss at the final CG iterate (NaN if not evaluated)
    f0_warm: jax.Array  # loss at the CG warm start (NaN if not evaluated)
    alpha: jax.Array  # accepted step size (0.0 on line-search failure)
    f_alpha: jax.Array  # loss at alpha * step
    ls_failed: jax.Array  # bool
    not_descent: jax.Array  # bool
    bt_f: jax.Array  # [G+1] backtracking record (NaN = skipped)
    ls_alphas: jax.Array  # [ls_max_iter] (NaN = not tried)
    ls_f: jax.Array  # [ls_max_iter]


def fused_trials(
    f: Callable[[jax.Array], jax.Array],
    cgres: CGResult,
    x0: jax.Array,
    f_grad_0: jax.Array,
    f_0: jax.Array,
    *,
    eval_f0: bool,
    use_backtracking: bool,
    eval_fstep: bool,
    use_linesearch: bool,
    compute_final_loss: bool,
    init_alpha: float = 1.0,
    beta: float = 0.8,
    c: float = 1e-2,
    ls_max_iter: int = 20,
) -> FusedTrialsResult:
    """All trial-loss phases of one HF step as ONE bounded loop: the LM
    heuristic's f(warm start), the CG-backtracking reverse walk and the
    Armijo line search (reference optimizer.py:299-340) share a single
    trace of the loss function.

    Motivation is COMPILE time, not run time: each `lax.while_loop` body
    embeds a full forward pass of the model; three separate loops (plus the
    standalone f_0 evaluation) meant four traced copies of a conv model's
    forward graph in the step program.  This evaluator is a small state
    machine -- phase 0 evaluates f(x0), phase 1 walks the stored iterates in
    reverse with the reference's first-non-improvement early exit, phase 2
    runs the Armijo shrink loop on the chosen step -- whose body contains
    exactly ONE call of ``f``.  The evaluated points, their order within
    each phase and every selection rule are identical to the standalone
    :func:`cg_efficient_backtracking` / :func:`simple_linesearch`, so the
    numerics are bit-identical; the walk additionally jumps straight from
    the final iterate to the last stored-and-reached grid row (never-reached
    rows cannot consume an evaluation either way).

    Args mirror the standalone routines; the static flags select which
    phases exist in the compiled program.
    """
    if beta >= 1.0:
        raise ValueError(f"Invalid reduction factor beta = {beta}")
    if c < 0.0:
        raise ValueError(f"Invalid c = {c}")
    if use_linesearch and ls_max_iter < 1:
        raise ValueError(f"Invalid line-search max_iter {ls_max_iter}")

    G, iters_arr = _candidates(cgres)
    dtype = cgres.x.dtype
    nan = jnp.asarray(jnp.nan, dtype)
    inf = jnp.asarray(jnp.inf, dtype)

    def step_at(j):
        if G == 0:
            return cgres.x
        jc = jnp.minimum(j, G - 1)
        return jnp.where(j == G, cgres.x, cgres.row(jc).astype(cgres.x.dtype))

    # Valid candidate rows form a contiguous prefix [0, k): the grid is
    # ascending, rows at/after num_iters were never reached or duplicate the
    # final iterate (the reference's None holes, cg_backtracking.py:85-86).
    k_valid = (
        jnp.sum(
            (iters_arr < cgres.num_iters).astype(jnp.int32), dtype=jnp.int32
        )
        if G
        else jnp.asarray(0, jnp.int32)
    )

    # Static phase plan.
    p1 = use_backtracking or eval_fstep
    p2 = use_linesearch or compute_final_loss
    after1 = 2 if p2 else 3
    after0 = 1 if p1 else after1
    first = 0 if eval_f0 else after0

    # Returned alpha/f trace length: the standalone path exposes no trace
    # without a line search, so the fused path matches with L = 0 (the
    # compute_final_loss-only evaluation still runs, via the 1-slot
    # scratch trace buffer below, but is not surfaced).
    L = ls_max_iter if use_linesearch else 0

    carry0 = dict(
        phase=jnp.asarray(first, jnp.int32),
        j=jnp.asarray(G, jnp.int32),  # bt cursor (starts at final iterate)
        best=jnp.asarray(G, jnp.int32),
        fmin=inf,
        f_at_G=nan,
        f0_warm=nan,
        bt_rec=jnp.full((G + 1,), nan),
        alpha=jnp.asarray(init_alpha, dtype),
        ls_i=jnp.asarray(0, jnp.int32),
        ls_accepted=jnp.asarray(False),
        f_alpha=nan,
        a_trace=jnp.full((max(L, 1),), nan, dtype),
        f_trace=jnp.full((max(L, 1),), nan, dtype),
    )

    def cond(cy):
        return cy["phase"] < 3

    def body(cy):
        phase = cy["phase"]
        # ONE candidate-buffer read serves both bt (row j) and ls (row best).
        row = jnp.where(phase == 1, cy["j"], cy["best"])
        cand = step_at(row)
        if eval_f0:
            delta = jnp.where(phase == 0, x0, cand)
        else:
            delta = cand
        if p2:
            delta = jnp.where(phase == 2, cy["alpha"] * cand, delta)
        fv = f(delta)  # the single traced forward of the whole evaluator

        out = dict(cy)

        if eval_f0:
            in0 = phase == 0
            out["f0_warm"] = jnp.where(in0, fv, cy["f0_warm"])
            out["phase"] = jnp.where(in0, after0, out["phase"])

        if p1:
            in1 = phase == 1
            j = cy["j"]
            improved = fv < cy["fmin"]
            take = in1 & improved
            out["best"] = jnp.where(take, j, cy["best"])
            out["fmin"] = jnp.where(take, fv, cy["fmin"])
            out["f_at_G"] = jnp.where(
                in1 & (j == G), fv, cy["f_at_G"]
            )
            out["bt_rec"] = jnp.where(
                in1,
                cy["bt_rec"].at[jnp.minimum(j, G)].set(fv),
                cy["bt_rec"],
            )
            if use_backtracking:
                # jump from the final iterate straight to the last reached
                # grid row; then walk down; stop at first non-improvement
                next_j = jnp.where(j == G, k_valid - 1, j - 1)
                done1 = jnp.logical_not(improved) | (next_j < 0)
            else:
                next_j = j
                done1 = jnp.asarray(True)  # single f(final) evaluation
            out["j"] = jnp.where(in1, next_j, cy["j"])
            out["phase"] = jnp.where(in1 & done1, after1, out["phase"])

        if p2:
            in2 = phase == 2
            if use_linesearch:
                i = cy["ls_i"]
                c_dir = jnp.asarray(c, dtype) * jnp.vdot(f_grad_0, cand)
                accept = fv <= f_0 + cy["alpha"] * c_dir
                out["a_trace"] = jnp.where(
                    in2, cy["a_trace"].at[i].set(cy["alpha"]), cy["a_trace"]
                )
                out["f_trace"] = jnp.where(
                    in2, cy["f_trace"].at[i].set(fv), cy["f_trace"]
                )
                out["ls_accepted"] = jnp.where(
                    in2, accept, cy["ls_accepted"]
                )
                out["f_alpha"] = jnp.where(in2, fv, cy["f_alpha"])
                out["alpha"] = jnp.where(
                    in2 & jnp.logical_not(accept),
                    cy["alpha"] * jnp.asarray(beta, dtype),
                    out["alpha"],
                )
                out["ls_i"] = jnp.where(in2, i + 1, cy["ls_i"])
                done2 = accept | (i + 1 >= ls_max_iter)
            else:
                out["f_alpha"] = jnp.where(in2, fv, cy["f_alpha"])
                out["ls_accepted"] = jnp.where(in2, True, cy["ls_accepted"])
                done2 = jnp.asarray(True)
            out["phase"] = jnp.where(in2 & done2, 3, out["phase"])

        return out

    if first == 3:
        cy = carry0  # nothing to evaluate (no phase active)
    else:
        cy = jax.lax.while_loop(cond, body, carry0)

    best = cy["best"]
    step_vec = step_at(best)
    best_iter = (
        jnp.where(
            best == G,
            cgres.num_iters,
            iters_arr[jnp.minimum(best, max(G - 1, 0))],
        )
        if G
        else cgres.num_iters
    ).astype(jnp.int32)

    if use_linesearch:
        accepted = cy["ls_accepted"]
        c_dir_final = jnp.asarray(c, dtype) * jnp.vdot(f_grad_0, step_vec)
        alpha_out = jnp.where(
            accepted,
            # undo the trailing shrink applied after an accepted trial never
            # happens (alpha only shrinks on reject), so alpha is correct
            cy["alpha"],
            jnp.asarray(0.0, dtype),
        )
        f_alpha_out = jnp.where(accepted, cy["f_alpha"], f_0)
        ls_failed = jnp.logical_not(accepted)
        not_descent = c_dir_final >= 0
    else:
        alpha_out = jnp.asarray(init_alpha, dtype)
        f_alpha_out = cy["f_alpha"] if compute_final_loss else nan
        ls_failed = jnp.asarray(False)
        not_descent = jnp.asarray(False)

    return FusedTrialsResult(
        step=step_vec,
        best_iter=best_iter,
        f_final=cy["f_at_G"],
        f0_warm=cy["f0_warm"],
        alpha=alpha_out,
        f_alpha=f_alpha_out,
        ls_failed=ls_failed,
        not_descent=not_descent,
        bt_f=cy["bt_rec"],
        ls_alphas=cy["a_trace"][:L],
        ls_f=cy["f_trace"][:L],
    )
