"""The Hessian-free optimizer: functional core + stateful wrapper.

TPU-native rebuild of the reference ``HessianFree`` optimizer
(reference hessianfree/optimizer.py:18-952).  The reference orchestrates one
update as: forward -> gradient -> curvature-matvec closure -> damped PCG ->
warm-start decay -> Levenberg-Marquardt damping adaptation -> CG-backtracking
-> Armijo line search -> in-place parameter write
(reference optimizer.py:208-363).  Here the *entire* pipeline is one pure
function of ``(params, state, batch)`` staged through a single ``jax.jit`` --
every trial forward pass of the backtracking walk and the line search runs
on-device inside bounded loops, with zero host round-trips per optimizer
step.

Design: functional core (:func:`hf_step`, :func:`make_hf_step`) with an
explicit :class:`HFState` pytree replacing ``torch.optim.Optimizer`` state
(reference optimizer.py:183-192), plus a thin stateful convenience wrapper
(:class:`HessianFree`) that owns the parameter pytree and keeps the
reference's eight observability history lists.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import config as config_mod
from .config import HFConfig
from .ops import cg as cg_mod
from .ops.cg import cg
from .ops.curvature import ggnvp_fn, hvp_fn
from .ops.nystrom import NystromSketch, lowrank_arg, nystrom_to_preconditioner
from .ops.precond import diag_EF, diag_EF_scan, diag_to_preconditioner
from .ops.select import (
    cg_efficient_backtracking,
    fused_trials,
    simple_linesearch,
)
from .utils.flatten import TrainableRavel


class HFState(NamedTuple):
    """Cross-step optimizer state -- a serializable pytree.

    Replaces the reference's ``self.state`` dict (the CG warm-start ``x0``,
    reference optimizer.py:184, :508-516) and the live adapted damping stored
    in ``param_groups[0]["damping"]`` (reference optimizer.py:495-497).
    """

    x0: jax.Array  # [dim] CG warm start (decayed previous solution)
    damping: jax.Array  # scalar, live (LM-adapted) Tikhonov damping
    step_count: jax.Array  # int32


class HFStats(NamedTuple):
    """Per-step observability record.

    Replaces the reference's eight history lists (init/final losses,
    dampings, cg reasons, cg iteration counts, best backtracking iterate,
    learning rates -- reference optimizer.py:186-192) plus its
    warnings-as-control-flow, surfaced as flags (warnings don't compose with
    jit): non-positive directional curvature (reference cg.py:132-139),
    negative reduction ratio (reference optimizer.py:503-506), non-descent
    direction (reference linesearch.py:72-75) and line-search failure
    (reference linesearch.py:99-103).
    """

    init_loss: jax.Array
    final_loss: jax.Array
    damping: jax.Array  # damping used for this step's CG solve
    new_damping: jax.Array  # damping after LM adaptation
    rho: jax.Array  # LM reduction ratio (NaN if adaptation disabled)
    cg_reason: jax.Array  # int32, see ops.cg.CG_REASON_STRINGS
    num_cg_iters: jax.Array  # int32
    best_cg_iter: jax.Array  # int32, chosen backtracking iterate
    lr: jax.Array  # step-size actually applied
    nonpos_curvature: jax.Array  # bool
    rho_negative: jax.Array  # bool
    linesearch_failed: jax.Array  # bool
    not_descent_direction: jax.Array  # bool
    # Solver-depth record (HFDetail) when config.rich_stats, else None --
    # the on-device analog of the reference's per-CG-iteration lines,
    # backtracking table and line-search trace (reference cg.py:202-203,
    # cg_backtracking.py:100-110, linesearch.py:57-102).
    detail: Any = None


class HFDetail(NamedTuple):
    """Opt-in per-phase solver trace (``HFConfig.rich_stats=True``).

    All arrays are static-shaped with NaN in never-evaluated slots; valid
    entries of ``m_hist`` are ``0..num_cg_iters``.
    """

    m_hist: jax.Array  # [cg_max_iter + 1] quadratic values m(x_i)
    cand_iters: jax.Array  # [G+1] int32 CG iteration per candidate (last=final)
    bt_f: jax.Array  # [G+1] backtracking losses (NaN = skipped by early exit)
    ls_alphas: jax.Array  # [ls_max_iter] trial step sizes (NaN = not tried)
    ls_f: jax.Array  # [ls_max_iter] losses at the trials


class HFModelFns(NamedTuple):
    """Static bundle of user model/loss callables (hashable for jit).

    Two entry forms, mirroring the reference's ``forward`` contract
    (reference optimizer.py:137-154):

    - split form (required for GGN): ``model_fn(params, inputs) -> outputs``
      and ``loss_outer(outputs, targets) -> scalar``; the batch is an
      ``(inputs, targets)`` tuple.
    - direct form (Hessian-only workloads such as Rosenbrock):
      ``loss_fn(params, batch) -> scalar``.

    ``loss_reg(params) -> scalar`` is an optional params-dependent loss term
    (e.g. L2 weight decay).  It is folded into every *loss* evaluation --
    the gradient, the LM reduction ratio, CG-backtracking and the line
    search all see the regularized objective -- while GGN curvature keeps
    flowing through the model outputs only, exactly the reference's
    behavior with a DeepOBS-style regularized loss closure
    (reference examples/example_utils.py:76-81: the reg term rides the live
    model parameters; reference optimizer.py:457-462: ``_Gv`` differentiates
    w.r.t. ``outputs``, so an additive params-only term contributes zero GGN
    curvature).  The Hessian path ("hessian") differentiates the full
    regularized loss, again like the reference's double backward.
    """

    model_fn: Optional[Callable[[Any, Any], Any]] = None
    loss_outer: Optional[Callable[[Any, Any], jax.Array]] = None
    loss_fn: Optional[Callable[[Any, Any], jax.Array]] = None
    loss_reg: Optional[Callable[[Any], jax.Array]] = None

    def data_loss(self, params, batch):
        """Loss WITHOUT the params-dependent regularizer (per-batch part)."""
        if self.loss_fn is not None:
            return self.loss_fn(params, batch)
        inputs, targets = batch
        return self.loss_outer(self.model_fn(params, inputs), targets)

    def full_loss(self, params, batch):
        loss = self.data_loss(params, batch)
        if self.loss_reg is not None:
            loss = loss + self.loss_reg(params)
        return loss


def init_state(
    ravel: TrainableRavel, config: HFConfig, dtype=None
) -> HFState:
    """Fresh optimizer state: zero warm start (reference cg.py:178 default)
    and the configured initial damping."""
    dtype = dtype or ravel.dtype
    return HFState(
        x0=jnp.zeros((ravel.dim,), dtype),
        damping=jnp.asarray(config.damping, dtype),
        step_count=jnp.asarray(0, jnp.int32),
    )


def _adapt_damping(config: HFConfig, damping, f_0, f_step, m_0, m_step):
    """Levenberg-Marquardt damping heuristic (reference optimizer.py:464-506).

    ``rho = (f_step - f_0) / (m_step - m_0)``; damping x 3/2 if rho < 1/4,
    x 2/3 if rho > 3/4.  ``f_0`` is the loss at the CG *warm start* (the
    reference evaluates ``tfunc(x_iters[0])``, optimizer.py:302), not at 0.
    """
    rho = (f_step - f_0) / (m_step - m_0)
    factor = jnp.where(
        rho < 0.25,
        jnp.asarray(3.0 / 2.0, damping.dtype),
        jnp.where(
            rho > 0.75,
            jnp.asarray(2.0 / 3.0, damping.dtype),
            jnp.asarray(1.0, damping.dtype),
        ),
    )
    return rho, damping * factor


def _step_core(
    config: HFConfig,
    ravel: TrainableRavel,
    params: Any,
    state: HFState,
    *,
    init_loss: jax.Array,
    grad_vec: jax.Array,
    mvp_vec: Callable[[jax.Array], jax.Array],
    loss_at: Callable[[jax.Array], jax.Array],
    M: Optional[Callable[[jax.Array], jax.Array]],
    shard_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_buf: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Tuple[Any, HFState, HFStats]:
    """Shared orchestration on flat vectors; exact reference phase order
    (reference optimizer.py:208-363).

    Args:
        init_loss: loss at the current parameters on this step's batch.
        grad_vec: flat loss gradient (CG right-hand side is its negation).
        mvp_vec: undamped curvature matvec on flat vectors.
        loss_at: ``delta -> loss(params + delta)`` -- the reference's
            ``tfunc`` (optimizer.py:288-294) made pure.
        M: optional preconditioner matvec.
        shard_vec / shard_buf: optional sharding-constraint hooks for the
            flat CG vectors / iterate buffer (see
            :func:`~pytorchhessianfree_tpu.parallel.make_sharded_hf_step`).
    """
    damping = state.damping
    sv = shard_vec if shard_vec is not None else (lambda v: v)
    grad_vec = sv(grad_vec)

    # Damped curvature matvec (reference optimizer.py:266).
    def A(v):
        with jax.named_scope("hf_curvature_matvec"):
            return mvp_vec(v) + damping * v

    # Only store initial + final solution unless backtracking wants the
    # automatic grid (reference optimizer.py:260-262).
    store = None if config.use_cg_backtracking else (0,)

    # Named scopes annotate the phases in `jax.profiler` traces -- the
    # structured replacement for the reference's verbose prints
    # (reference cg.py:202-203, cg_backtracking.py:100-110, etc.).
    cgres = cg(
        A,
        -grad_vec,
        x0=state.x0,
        M=M,
        max_iter=(
            config.cg_max_iter if config.cg_max_iter is not None else ravel.dim
        ),
        tol=config.cg.tol,
        atol=config.cg.atol,
        martens_conv_crit=True,
        store_x_at_iters=store,
        grid_gamma=config.cg.grid_gamma,
        martens_threshold=config.cg.martens_threshold,
        martens_min_window=config.cg.martens_min_window,
        nonpos_curv_option=config.cg.nonpos_curv_option,
        store_dtype=config.cg.store_dtype,
        buffer_layout=config.cg.buffer_layout,
        store_mode=config.cg.store_mode,
        shard_vec=shard_vec,
        shard_buf=shard_buf,
    )

    # Warm start for the next step: decayed *final* (not backtracked) iterate
    # (reference optimizer.py:279-281).
    new_x0 = jnp.asarray(config.cg_decay_x0, cgres.x.dtype) * cgres.x

    use_fused = (
        config.fused_trials
        and config.backtracking_mode == "sequential"
        and config.linesearch.mode == "sequential"
    )

    if use_fused:
        # All trial-loss phases -- f(warm start) for the LM heuristic, the
        # backtracking reverse walk, the Armijo line search (reference
        # optimizer.py:299-340) -- as ONE while_loop with a single traced
        # forward of the model (ops.select.fused_trials).  Identical
        # evaluation points and selections; 3 fewer forward graphs in the
        # compiled step.
        with jax.named_scope("hf_fused_trials"):
            ft = fused_trials(
                loss_at,
                cgres,
                state.x0,
                grad_vec,
                init_loss,
                eval_f0=config.adapt_damping,
                use_backtracking=config.use_cg_backtracking,
                eval_fstep=config.adapt_damping,
                use_linesearch=config.use_linesearch,
                compute_final_loss=config.compute_final_loss,
                init_alpha=config.lr,
                beta=config.linesearch.beta,
                c=config.linesearch.c,
                ls_max_iter=config.linesearch.max_iter,
            )
        step_vec = ft.step
        best_cg_iter = ft.best_iter
        f_0 = ft.f0_warm
        f_at_final = ft.f_final
        lr = ft.alpha
        final_loss = ft.f_alpha
        ls_failed = ft.ls_failed
        not_descent = ft.not_descent
        bt_f_detail = ft.bt_f
        ls_alphas_detail = ft.ls_alphas
        ls_f_detail = ft.ls_f
        if not config.use_linesearch and not config.compute_final_loss:
            final_loss = jnp.asarray(jnp.nan, init_loss.dtype)
    else:
        # Standalone loops (batched select modes, or fused_trials=False).
        # CG-backtracking (reference optimizer.py:311-318) runs before the
        # LM heuristic so its (always-evaluated) loss at the final iterate
        # can be reused as the heuristic's f_step -- the same value the
        # reference computes twice (optimizer.py:303 and the first
        # backtracking candidate).
        if config.use_cg_backtracking:
            with jax.named_scope("hf_cg_backtracking"):
                bt = cg_efficient_backtracking(
                    loss_at, cgres, mode=config.backtracking_mode
                )
            step_vec = bt.step
            best_cg_iter = bt.best_iter
            f_at_final = bt.f_final
            bt_f_detail = bt.f_vals
        else:
            step_vec = cgres.x
            best_cg_iter = cgres.num_iters
            f_at_final = None
            bt_f_detail = None

        if config.adapt_damping:
            f_0 = loss_at(state.x0)  # loss at x_iters[0] = the warm start
            if f_at_final is None:
                f_at_final = loss_at(cgres.x)
                if config.rich_stats:
                    # record the evaluation at the final iterate (slot G),
                    # matching what the fused evaluator records for the
                    # same configuration
                    G1 = len(cgres.stored_iters) + 1
                    bt_f_detail = (
                        jnp.full((G1,), jnp.nan, grad_vec.dtype)
                        .at[-1]
                        .set(f_at_final)
                    )
        else:
            f_0 = None

        # Line search (reference optimizer.py:323-340).
        if config.use_linesearch:
            with jax.named_scope("hf_linesearch"):
                ls = simple_linesearch(
                    loss_at,
                    grad_vec,
                    step_vec,
                    f_0=init_loss,
                    init_alpha=config.lr,
                    beta=config.linesearch.beta,
                    c=config.linesearch.c,
                    max_iter=config.linesearch.max_iter,
                    mode=config.linesearch.mode,
                    batch_chunk=config.linesearch.batch_chunk,
                )
            lr = ls.alpha
            final_loss = ls.f_alpha
            ls_failed = ls.failed
            not_descent = ls.not_descent
            ls_alphas_detail = ls.alphas
            ls_f_detail = ls.f_trace
        else:
            lr = jnp.asarray(config.lr, step_vec.dtype)
            if config.compute_final_loss:
                final_loss = loss_at(lr * step_vec)
            else:
                final_loss = jnp.asarray(jnp.nan, init_loss.dtype)
            ls_failed = jnp.asarray(False)
            not_descent = jnp.asarray(False)
            ls_alphas_detail = None
            ls_f_detail = None

    # LM damping adaptation (reference optimizer.py:299-306).
    if config.adapt_damping:
        with jax.named_scope("hf_adapt_damping"):
            rho, new_damping = _adapt_damping(
                config, damping, f_0, f_at_final, cgres.m_hist[0],
                cgres.m_final,
            )
        rho_negative = rho < 0
    else:
        rho = jnp.asarray(jnp.nan, grad_vec.dtype)
        new_damping = damping
        rho_negative = jnp.asarray(False)

    # Parameter update (reference optimizer.py:349-350) -- functional.
    new_params = ravel.add(params, lr * step_vec)

    if config.rich_stats:
        nanv = jnp.asarray(jnp.nan, grad_vec.dtype)
        cand_iters = jnp.concatenate(
            [
                jnp.asarray(cgres.stored_iters, jnp.int32).reshape(-1),
                cgres.num_iters.reshape(1).astype(jnp.int32),
            ]
        )
        G1 = cand_iters.shape[0]
        detail = HFDetail(
            m_hist=cgres.m_hist,
            cand_iters=cand_iters,
            bt_f=(
                bt_f_detail
                if bt_f_detail is not None
                else jnp.full((G1,), nanv)
            ),
            ls_alphas=(
                ls_alphas_detail
                if ls_alphas_detail is not None
                else jnp.zeros((0,), grad_vec.dtype)
            ),
            ls_f=(
                ls_f_detail
                if ls_f_detail is not None
                else jnp.zeros((0,), grad_vec.dtype)
            ),
        )
    else:
        detail = None

    new_state = HFState(
        x0=new_x0, damping=new_damping, step_count=state.step_count + 1
    )
    stats = HFStats(
        init_loss=init_loss,
        final_loss=final_loss,
        damping=damping,
        new_damping=new_damping,
        rho=rho,
        cg_reason=cgres.reason,
        num_cg_iters=cgres.num_iters,
        best_cg_iter=jnp.asarray(best_cg_iter, jnp.int32),
        lr=lr,
        nonpos_curvature=cgres.nonpos_pAp,
        rho_negative=rho_negative,
        linesearch_failed=ls_failed,
        not_descent_direction=not_descent,
        detail=detail,
    )
    return new_params, new_state, stats


def _maybe_remat(fns: HFModelFns, config: HFConfig) -> HFModelFns:
    """Apply ``config.remat``: checkpoint the model forward (resp.
    ``loss_fn``) so autodiff residuals are recomputed, not stored."""
    if not config.remat:
        return fns
    if fns.loss_fn is not None:
        fns = fns._replace(loss_fn=jax.checkpoint(fns.loss_fn))
    if fns.model_fn is not None:
        fns = fns._replace(model_fn=jax.checkpoint(fns.model_fn))
    return fns


def _build_matvec_and_grad(
    fns: HFModelFns, config: HFConfig, ravel: TrainableRavel, params, batch
):
    """Loss, flat gradient and flat curvature matvec for one batch.

    Replaces the reference's gradient-with-retained-graph plus BackPACK
    matvec closures (reference optimizer.py:230-247): the GGN path linearizes
    the model once per batch and reuses the linearization for every CG
    matvec; the Hessian path uses forward-over-reverse per matvec.

    When ``config.curvature_dtype`` is set, the matvec runs through a
    reduced-precision cast of the model (bf16 on the MXU) while the loss and
    gradient stay full precision.

    When ``config.remat`` is set, the model forward (resp. ``loss_fn``) is
    wrapped in ``jax.checkpoint``: linearization/VJP residuals are
    recomputed instead of stored -- activation memory traded for FLOPs,
    identical numerics.
    """
    fns = _maybe_remat(fns, config)
    cdtype = (
        jnp.dtype(config.curvature_dtype)
        if config.curvature_dtype is not None
        else None
    )

    def cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(jnp.result_type(a), jnp.floating)
            else a,
            tree,
        )

    if config.curvature_opt == "ggn":
        if fns.model_fn is None or fns.loss_outer is None:
            raise ValueError(
                "curvature_opt='ggn' needs the split form: model_fn + "
                "loss_outer (the GGN is defined through the model outputs, "
                "reference optimizer.py:152-154)."
            )
        inputs, targets = batch

        def model_at(p):
            return fns.model_fn(p, inputs)

        def outer(out):
            return fns.loss_outer(out, targets)

        loss, _outputs, grad_tree, mvp_tree = ggnvp_fn(model_at, outer, params)

        if fns.loss_reg is not None:
            # Regularized objective: loss and gradient include the
            # params-dependent term; the GGN matvec does NOT (it flows
            # through the outputs, where an additive params-only term has
            # zero curvature -- reference optimizer.py:457-462 behavior
            # with the regularized forward closure).
            reg_val, reg_grad = jax.value_and_grad(fns.loss_reg)(params)
            loss = loss + reg_val
            grad_tree = jax.tree_util.tree_map(
                jnp.add, grad_tree, reg_grad
            )

        if cdtype is not None:
            lp_inputs = cast(inputs, cdtype)

            def lp_model_at(p):
                # cast outputs back so the loss Hessian stays full precision
                out = fns.model_fn(p, lp_inputs)
                return cast(out, ravel.dtype)

            _, _lp_out, _lp_grad, mvp_tree = ggnvp_fn(
                lp_model_at, outer, cast(params, cdtype)
            )
    else:

        def loss_of(p):
            return fns.full_loss(p, batch)

        loss, grad_tree, mvp_tree = hvp_fn(loss_of, params)

        if cdtype is not None:
            lp_batch = cast(batch, cdtype)

            def lp_loss_of(p):
                return fns.full_loss(p, lp_batch).astype(ravel.dtype)

            _, _, mvp_tree = hvp_fn(lp_loss_of, cast(params, cdtype))

    grad_vec = ravel.ravel(grad_tree)

    if cdtype is None:

        def mvp_vec(v):
            return ravel.ravel(mvp_tree(ravel.unravel(v)))

    else:

        def mvp_vec(v):
            tangent = cast(ravel.unravel(v), cdtype)
            return ravel.ravel(mvp_tree(tangent))

    return loss, grad_vec, mvp_vec


def hf_step(
    params: Any,
    state: HFState,
    batch: Any,
    *,
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    precond_diag: Optional[jax.Array] = None,
    precond_exponent: float = 0.75,
    precond_lowrank: Optional[NystromSketch] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    grad_vec: Optional[jax.Array] = None,
    mvp_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_buf: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Tuple[Any, HFState, HFStats]:
    """One Hessian-free update -- the functional analog of
    ``HessianFree.step`` (reference optimizer.py:126-363).

    ``precond_lowrank``: a :class:`~pytorchhessianfree_tpu.NystromSketch`
    (dynamic operand, like ``precond_diag``); the step builds the low-rank
    ``(A + damping I)^{-1}`` approximation with the live damping.

    Pure function of ``(params, state, batch)``; meant to be jitted (see
    :func:`make_hf_step`).  ``precond_diag`` is a dynamic operand: pass the
    empirical-Fisher diagonal and the step builds Martens'
    ``(D + damping)^(-exponent)`` preconditioner with the *live* damping,
    matching ``get_preconditioner``'s use of the current group damping
    (reference optimizer.py:943-952).  Custom ``grad_vec`` / ``mvp_vec``
    override the derived quantities (the reference's ``grad=``/``mvp=``
    arguments, used by the accumulation path).

    ``config.matmul_precision`` applies to every matmul/conv traced here
    (forward passes, curvature products, trial evaluations) -- see the
    knob's rationale in :class:`~pytorchhessianfree_tpu.config.HFConfig`.
    """
    with config_mod.precision_ctx(config):
        return _hf_step_impl(
            params, state, batch, fns=fns, config=config, ravel=ravel,
            precond_diag=precond_diag, precond_exponent=precond_exponent,
            precond_lowrank=precond_lowrank,
            M=M, grad_vec=grad_vec, mvp_vec=mvp_vec, shard_vec=shard_vec,
            shard_buf=shard_buf,
        )


def _hf_step_impl(
    params: Any,
    state: HFState,
    batch: Any,
    *,
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    precond_diag: Optional[jax.Array] = None,
    precond_exponent: float = 0.75,
    precond_lowrank: Optional[NystromSketch] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    grad_vec: Optional[jax.Array] = None,
    mvp_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_buf: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Tuple[Any, HFState, HFStats]:
    loss, derived_grad, derived_mvp = _build_matvec_and_grad(
        fns, config, ravel, params, batch
    )
    if grad_vec is None:
        grad_vec = derived_grad
    if mvp_vec is None:
        mvp_vec = derived_mvp

    if M is None and precond_diag is not None:
        M = diag_to_preconditioner(
            precond_diag, state.damping, precond_exponent
        )
    elif M is None and precond_lowrank is not None:
        # Low-rank Nystrom preconditioner, built with the LIVE damping
        # like the diagonal path above (ops/nystrom.py).
        M = nystrom_to_preconditioner(precond_lowrank, state.damping)
    elif M is None and config.precond == "diag_ef":
        # In-step automatic preconditioning: the empirical-Fisher diagonal
        # from THIS step's batch, computed on-device inside the same jitted
        # program (no external get_preconditioner flow needed).
        if fns.model_fn is None:
            raise ValueError(
                "precond='diag_ef' requires the split model form "
                "(per-sample gradients need model_fn + loss_outer)."
            )
        inputs, targets = batch
        diag = diag_EF(
            fns.model_fn, fns.loss_outer, params, inputs, targets,
            config.precond_reduction, ravel, loss_reg=fns.loss_reg,
        )
        M = diag_to_preconditioner(
            diag, state.damping, config.precond_exponent
        )

    def loss_at(delta):
        return fns.full_loss(ravel.add(params, delta), batch)

    return _step_core(
        config,
        ravel,
        params,
        state,
        init_loss=loss,
        grad_vec=grad_vec,
        mvp_vec=mvp_vec,
        loss_at=loss_at,
        M=M,
        shard_vec=shard_vec,
        shard_buf=shard_buf,
    )


def precond_arg(precond_diag, ravel: TrainableRavel):
    """Normalize an optional preconditioner diagonal for the jitted-step
    calling convention shared by every step builder: ``None`` becomes a
    dummy ``(1,)`` vector plus a static ``use_precond=False`` flag (jit
    cannot take an optional array operand without retracing)."""
    if precond_diag is None:
        return jnp.zeros((1,), ravel.dtype), False
    return precond_diag, True


def make_hf_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    precond_exponent: float = 0.75,
    donate: bool = False,
):
    """Jit-compile the full optimizer step.

    Returns ``step(params, state, batch, precond_diag=None) ->
    (params, state, stats)`` compiled into a single XLA program.  With
    ``donate=True`` the parameter and state buffers are donated so the update
    is in-place in HBM (the stateful :class:`HessianFree` wrapper does this;
    off by default because donated inputs cannot be reused by the caller).
    """

    @functools.partial(
        jax.jit,
        static_argnames=("use_precond", "use_lowrank"),
        donate_argnums=(0, 1) if donate else (),
    )
    def _step(params, state, batch, precond_diag, use_precond,
              precond_lowrank, use_lowrank):
        return hf_step(
            params,
            state,
            batch,
            fns=fns,
            config=config,
            ravel=ravel,
            precond_diag=precond_diag if use_precond else None,
            precond_exponent=precond_exponent,
            precond_lowrank=precond_lowrank if use_lowrank else None,
        )

    def step(params, state, batch, precond_diag=None, precond_lowrank=None):
        if precond_diag is not None and precond_lowrank is not None:
            raise ValueError(
                "Pass either precond_diag or precond_lowrank, not both."
            )
        precond_diag, use_precond = precond_arg(precond_diag, ravel)
        precond_lowrank, use_lowrank = lowrank_arg(precond_lowrank, ravel)
        return _step(params, state, batch, precond_diag, use_precond,
                     precond_lowrank, use_lowrank)

    return step


def make_hf_train_loop(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    precond_exponent: float = 0.75,
    donate: bool = False,
    precond_ema_decay: Optional[float] = None,
):
    """Multi-step training as ONE compiled program: ``lax.scan`` over
    optimizer steps.

    TPU-native capability with no reference analog (its training loops are
    Python-side): ``loop(params, state, batches)`` consumes a stacked batch
    pytree with a leading steps axis and runs every HF step on-device,
    returning stacked per-step :class:`HFStats`.  Host involvement per epoch:
    one dispatch.

    ``precond_ema_decay``: maintain an exponential-moving-average
    empirical-Fisher diagonal across the scanned steps (the on-device analog
    of :class:`~pytorchhessianfree_tpu.ops.precond.EMADiag`) and precondition
    every CG solve with it.  Requires the split model form.  In this mode
    the loop's signature becomes ``loop(params, state, batches,
    ema_state=None) -> (params, state, stats, ema_state)`` so the EMA
    carries ACROSS loop invocations (epoch-by-epoch training does not
    restart it); pass the returned ``ema_state`` back in, or ``None`` to
    start fresh.
    """
    if precond_ema_decay is not None:
        if not 0.0 <= precond_ema_decay < 1.0:
            raise ValueError(f"Invalid decay {precond_ema_decay}")
        if fns.model_fn is None or fns.loss_outer is None:
            raise ValueError(
                "precond_ema_decay requires the split model form "
                "(per-sample gradients need model_fn + loss_outer)."
            )

    use_ema = precond_ema_decay is not None

    @functools.partial(
        jax.jit, donate_argnums=(0, 1) if donate else ()
    )
    def _loop(params, state, batches, ema_state):
        def body(carry, batch):
            if use_ema:
                p, s, ema, ema_ready = carry
                inputs, targets = batch
                with config_mod.precision_ctx(config):
                    d = diag_EF(
                        fns.model_fn, fns.loss_outer, p, inputs, targets,
                        config.precond_reduction, ravel,
                        loss_reg=fns.loss_reg,
                    )
                # An explicit "EMA seeded" flag (NOT step_count == 0): when
                # the loop resumes from a checkpoint with step_count > 0, the
                # first real diagonal must still seed the EMA rather than be
                # blended with the zero init.
                ema = jnp.where(
                    ema_ready,
                    precond_ema_decay * ema + (1.0 - precond_ema_decay) * d,
                    d,
                )
                ema_ready = jnp.asarray(True)
                precond_diag = ema
            else:
                p, s = carry
                precond_diag = None
            p, s, stats = hf_step(
                p,
                s,
                batch,
                fns=fns,
                config=config,
                ravel=ravel,
                precond_diag=precond_diag,
                precond_exponent=precond_exponent,
            )
            carry = (p, s, ema, ema_ready) if use_ema else (p, s)
            return carry, stats

        init = (params, state, *ema_state) if use_ema else (params, state)
        carry, stats = jax.lax.scan(body, init, batches)
        if use_ema:
            params, state, ema, ema_ready = carry
            return params, state, stats, (ema, ema_ready)
        params, state = carry
        return params, state, stats, ()

    def loop(params, state, batches, ema_state=None):
        if ema_state is None:
            ema_state = (
                (
                    jnp.zeros((ravel.dim,), ravel.dtype),
                    jnp.asarray(False),
                )
                if use_ema
                else ()
            )
        params, state, stats, ema_state = _loop(
            params, state, batches, ema_state
        )
        if not use_ema:
            return params, state, stats
        return params, state, stats, ema_state

    return loop


def hf_acc_step(
    params: Any,
    state: HFState,
    *,
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    loss_data,
    grad_data=None,
    mvp_data=None,
    reduction: str = "mean",
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    precond_diag: Optional[jax.Array] = None,
    precond_exponent: float = 0.75,
    mvp_amortize: bool = False,
    shard_vec: Optional[Callable[[jax.Array], jax.Array]] = None,
    shard_buf: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Tuple[Any, HFState, HFStats]:
    """Accumulated Hessian-free step -- the functional analog of
    ``HessianFree.acc_step`` (reference optimizer.py:519-606).

    Loss, gradient and curvature matvec are evaluated over *independent*
    datalists (``grad_data``/``mvp_data`` default to ``loss_data``,
    reference optimizer.py:575-579) and accumulated with the reference's
    weighted-sum semantics.  Datalists are either stacked ``[C, N, ...]``
    arrays (``lax.scan`` accumulation) or Python lists of ragged chunks
    (unrolled at trace time).  Like the reference, every CG iteration
    re-derives the curvature products chunk by chunk; the preferred
    large-scale path on TPU is the data-parallel mesh in ``parallel/``.

    ``config.matmul_precision`` applies to the whole accumulated step
    (gradient, curvature products and trial evaluations), matching
    :func:`hf_step`.
    """
    from . import accumulate as acc

    if config.precond == "diag_ef":
        raise ValueError(
            "precond='diag_ef' (in-step diagonal from the step's own batch) "
            "is a single-batch feature; for accumulated steps compute the "
            "diagonal explicitly (diag_EF / dp_diag_EF / EMADiag) and pass "
            "precond_diag."
        )
    if grad_data is None:
        grad_data = loss_data
    if mvp_data is None:
        mvp_data = loss_data

    fns = _maybe_remat(fns, config)
    with config_mod.precision_ctx(config):
        init_loss = acc.acc_loss(fns, params, loss_data, reduction)
        grad_vec = acc.acc_grad(fns, params, grad_data, reduction, ravel)
        mvp_vec = acc.make_acc_mvp(
            fns, config, params, mvp_data, reduction, ravel,
            amortize=mvp_amortize,
        )

        if M is None and precond_diag is not None:
            M = diag_to_preconditioner(
                precond_diag, state.damping, precond_exponent
            )

        def loss_at(delta):
            return acc.acc_loss(
                fns, ravel.add(params, delta), loss_data, reduction
            )

        return _step_core(
            config,
            ravel,
            params,
            state,
            init_loss=init_loss,
            grad_vec=grad_vec,
            mvp_vec=mvp_vec,
            loss_at=loss_at,
            M=M,
            shard_vec=shard_vec,
            shard_buf=shard_buf,
        )


def make_hf_acc_step(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    reduction: str = "mean",
    precond_exponent: float = 0.75,
    mvp_amortize: bool = False,
):
    """Jit-compile the accumulated step (one XLA program per datalist
    structure/shape; re-invocations with same-shaped chunks hit the cache).

    Returns ``step(params, state, loss_data, grad_data=None, mvp_data=None,
    precond_diag=None)``.
    """

    @functools.partial(jax.jit, static_argnames=("use_precond",))
    def _step(params, state, loss_data, grad_data, mvp_data, precond_diag,
              use_precond):
        return hf_acc_step(
            params,
            state,
            fns=fns,
            config=config,
            ravel=ravel,
            loss_data=loss_data,
            grad_data=grad_data,
            mvp_data=mvp_data,
            reduction=reduction,
            precond_diag=precond_diag if use_precond else None,
            precond_exponent=precond_exponent,
            mvp_amortize=mvp_amortize,
        )

    def step(params, state, loss_data, grad_data=None, mvp_data=None,
             precond_diag=None):
        if grad_data is None:
            grad_data = loss_data
        if mvp_data is None:
            mvp_data = loss_data
        precond_diag, use_precond = precond_arg(precond_diag, ravel)
        return _step(params, state, loss_data, grad_data, mvp_data,
                     precond_diag, use_precond)

    return step


def format_rich_stats(stats: HFStats) -> str:
    """Pretty-print an ``HFStats.detail`` record in the reference's verbose
    style: per-CG-iteration m-values (reference cg.py:202-203), the
    backtracking table (reference cg_backtracking.py:100-110) and the
    line-search trace (reference linesearch.py:57-102)."""
    import numpy as np

    d = stats.detail
    if d is None:
        return "(no detail recorded -- set HFConfig.rich_stats=True)"
    out = []
    num = int(stats.num_cg_iters)
    m = np.asarray(d.m_hist)
    out.append(f"CG m-history ({num} iterations):")
    for i in range(num + 1):
        out.append(f"  cg-iter {i:4d}  m = {m[i]: .9e}")

    out.append("Backtracking (reverse walk, NaN = skipped by early exit):")
    cand = np.asarray(d.cand_iters)
    bt = np.asarray(d.bt_f)
    best = int(stats.best_cg_iter)
    for j in range(len(cand) - 1, -1, -1):
        if j < len(cand) - 1 and cand[j] >= cand[-1]:
            continue  # buffer rows at/past the final iterate (never reached)
        tag = " <-- chosen" if int(cand[j]) == best and not np.isnan(bt[j]) else ""
        fstr = "   (skipped)" if np.isnan(bt[j]) else f"f = {bt[j]: .9e}"
        out.append(f"  cg-iter {int(cand[j]):4d}  {fstr}{tag}")

    if d.ls_alphas.shape[0]:
        out.append("Line search (Armijo):")
        al = np.asarray(d.ls_alphas)
        fl = np.asarray(d.ls_f)
        for i in range(len(al)):
            if np.isnan(al[i]) and np.isnan(fl[i]):
                continue
            mark = " <-- accepted" if al[i] == float(stats.lr) else ""
            out.append(f"  alpha = {al[i]:.6f}  f = {fl[i]: .9e}{mark}")
        if bool(stats.linesearch_failed):
            out.append("  no alpha accepted -> alpha = 0 (no update)")
    return "\n".join(out)


# --------------------------------------------------------------------------
# Debug self-tests (reference optimizer.py:365-448, :817-926)
# --------------------------------------------------------------------------


def check_deterministic(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    params: Any,
    batch: Any,
    key: Optional[jax.Array] = None,
    fns_factory: Optional[Callable[[jax.Array], HFModelFns]] = None,
    batch_factory: Optional[Callable[[], Any]] = None,
) -> dict:
    """Check for stochasticity that would corrupt CG's fixed quadratic model.

    Analog of ``_test_forward_determinisitc`` / ``_test_mvp_deterministic``
    (reference optimizer.py:365-448), redesigned for what can actually vary
    in this paradigm.  In torch, two ``forward()`` calls on a dropout model
    consume fresh global RNG state and differ; a pure JAX function of
    ``(params, batch)`` cannot -- so the double-evaluation checks below only
    catch *host-side* impurity (NumPy/Python RNG or other side effects
    inside user callables, possible because this check runs them eagerly,
    outside jit).  The failure mode that DOES exist in JAX -- a model that
    consumes an explicit PRNG key rethreaded between evaluations (dropout
    with a fresh key per forward), or a data pipeline yielding different
    batches per call -- is checked through the two factories:

    - ``fns_factory(prng_key) -> HFModelFns``: built twice with different
      keys and compared on the same batch.  A model whose loss depends on
      the key is stochastic (``rng_invariant=False``): HF requires fixing
      the key for the whole step, or disabling dropout (the analog of the
      reference's "consider calling model.eval()" advice,
      reference optimizer.py:406-409).
    - ``batch_factory() -> batch``: called twice and compared leaf-wise
      (``data_reproducible``); CG, backtracking and the line search all
      assume THE SAME batch throughout one step.

    Returns a dict of booleans instead of raising warnings (flags compose
    with jit; warnings don't).
    """
    results = {}
    loss1 = fns.full_loss(params, batch)
    loss2 = fns.full_loss(params, batch)
    results["forward_deterministic"] = bool(
        jnp.allclose(loss1, loss2)
    )
    if fns.model_fn is not None:
        inputs, _ = batch
        out1 = fns.model_fn(params, inputs)
        out2 = fns.model_fn(params, inputs)
        # outputs may be a pytree (e.g. dict with aux values)
        results["outputs_deterministic"] = bool(
            all(
                jnp.allclose(a, b)
                for a, b in zip(
                    jax.tree_util.tree_leaves(out1),
                    jax.tree_util.tree_leaves(out2),
                )
            )
        )

    if key is None:
        key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (ravel.dim,), ravel.dtype)
    _, _, mvp = _build_matvec_and_grad(fns, config, ravel, params, batch)
    results["mvp_deterministic"] = bool(jnp.allclose(mvp(v), mvp(v)))

    if fns_factory is not None:
        k1, k2 = jax.random.split(key)
        la = fns_factory(k1).full_loss(params, batch)
        lb = fns_factory(k2).full_loss(params, batch)
        results["rng_invariant"] = bool(jnp.allclose(la, lb))

    if batch_factory is not None:
        b1 = batch_factory()
        b2 = batch_factory()
        leaves1 = jax.tree_util.tree_leaves(b1)
        leaves2 = jax.tree_util.tree_leaves(b2)
        def leaves_equal(a, b):
            # leaves may be plain Python scalars (e.g. weights in a
            # (targets, w) pytree) -- normalize before comparing
            a = jnp.asarray(a)
            b = jnp.asarray(b)
            return a.shape == b.shape and bool(jnp.allclose(a, b))

        results["data_reproducible"] = len(leaves1) == len(leaves2) and all(
            leaves_equal(a, b) for a, b in zip(leaves1, leaves2)
        )

    return results


def check_reduction(
    fns: HFModelFns,
    config: HFConfig,
    ravel: TrainableRavel,
    params: Any,
    datalist,
    reduction: str,
    rtol: float = 1e-2,
    atol: float = 1e-4,
    key: Optional[jax.Array] = None,
) -> None:
    """Verify the user's claimed loss reduction ("mean"/"sum").

    Analog of ``HessianFree.test_reduction`` (reference optimizer.py:817-926):
    loss, gradient and matvec accumulated over the (>= 2-entry) datalist must
    match the same quantities on the concatenated single batch within
    RTOL=1e-2 / ATOL=1e-4 (reference optimizer.py:897-898); raises
    ``RuntimeError`` on mismatch.
    """
    from . import accumulate as acc

    chunks = acc._chunks(datalist)
    if len(chunks) <= 1:
        raise AssertionError(
            "This test is only meaningful for a data list with at least two "
            "entries."
        )

    if key is None:
        key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (ravel.dim,), ravel.dtype)

    a_loss = acc.acc_loss(fns, params, datalist, reduction)
    a_grad = acc.acc_grad(fns, params, datalist, reduction, ravel)
    a_mvp = acc.make_acc_mvp(fns, config, params, datalist, reduction, ravel)(v)

    big = acc.concat_datalist(datalist)
    r_loss, r_grad, r_mvp_fn = _build_matvec_and_grad(
        fns, config, ravel, params, big
    )
    r_mvp = r_mvp_fn(v)

    failures = []
    for name, ref, got in [
        ("loss values", r_loss, a_loss),
        ("gradients", r_grad, a_grad),
        ("mvps", r_mvp, a_mvp),
    ]:
        if not bool(jnp.allclose(got, ref, rtol=rtol, atol=atol)):
            failures.append(name)
    if failures:
        raise RuntimeError(
            f"Inconsistent results for reduction {reduction} "
            f"(mismatched: {', '.join(failures)}). The loss function's "
            "reduction does not match the declared one."
        )


# --------------------------------------------------------------------------
# Stateful convenience wrapper
# --------------------------------------------------------------------------


class HessianFree:
    """Stateful Hessian-free optimizer owning the parameter pytree.

    Convenience wrapper around the functional core with the reference's
    class-based ergonomics (reference optimizer.py:18-123): construct once,
    call :meth:`step` / :meth:`acc_step` per batch; the eight per-step
    history quantities (reference optimizer.py:186-192) accumulate in
    ``self.history``; :meth:`state_dict` round-trips everything.

    Args:
        params: Initial parameter pytree.
        model_fn / loss_outer: Split model form (``model_fn(params, inputs)``
            and ``loss_outer(outputs, targets)``); required for GGN.
        loss_fn: Direct form ``loss_fn(params, batch)`` (Hessian-only).
        trainable: Optional boolean mask pytree (the analog of per-tensor
            ``requires_grad``, reference optimizer.py:122).
        config: :class:`HFConfig`; or pass its fields as keyword args.
        mesh: Optional ``jax.sharding.Mesh`` -- the steps run sharded over
            it.  With a ``model_axis`` axis present the solver state (CG
            vectors + iterate grid) shards over it and the batch over
            ``data_axis`` (``parallel.sharded``); with only a data axis the
            batch shards data-parallel (``parallel.data_parallel``).  The
            stateful API is otherwise unchanged.
        param_specs: Optional pytree of ``PartitionSpec`` sharding the
            weights themselves (tensor parallelism; needs ``mesh`` with a
            model axis).
        batch_specs: Optional tree prefix of ``PartitionSpec`` placing the
            batch per leaf (context parallelism -- e.g. tokens ``[N, T]``
            under ``P(None, "model")`` shard the sequence axis; see
            ``parallel.sharded``).  Needs ``mesh`` with a model axis.
    """

    def __init__(
        self,
        params: Any,
        model_fn=None,
        loss_outer=None,
        loss_fn=None,
        loss_reg=None,
        trainable=None,
        config: Optional[HFConfig] = None,
        pad_to_multiple: Optional[int] = 1024,
        mesh=None,
        data_axis: str = "data",
        model_axis: str = "model",
        param_specs=None,
        batch_specs=None,
        **config_kwargs,
    ):
        if config is None:
            config = HFConfig(**config_kwargs)
        elif config_kwargs:
            raise ValueError("Pass either config or keyword args, not both.")
        self.config = config
        self.fns = HFModelFns(
            model_fn=model_fn,
            loss_outer=loss_outer,
            loss_fn=loss_fn,
            loss_reg=loss_reg,
        )
        if config.curvature_opt == "ggn" and model_fn is None:
            raise ValueError(
                "curvature_opt='ggn' requires model_fn + loss_outer."
            )
        # Own a private copy: the jitted step donates the param/state buffers
        # (in-place update in HBM), which must never invalidate arrays the
        # caller still holds.
        self.params = jax.tree_util.tree_map(jnp.array, params)
        # Lane-aligned flat vector space by default (pad_to_multiple=1024 =
        # 8 sublanes x 128 lanes of f32): measured 7x faster full-step
        # compile and 33% faster steps on TPU with identical numerics (see
        # TrainableRavel docs).  Pass pad_to_multiple=None for the exact
        # unpadded dimension (e.g. to inspect raw flat vectors).
        self.ravel = TrainableRavel(
            params, trainable, pad_to_multiple=pad_to_multiple
        )
        self.state = init_state(self.ravel, config)
        self.mesh = mesh
        self._data_axis = data_axis
        self._model_axis = model_axis
        self._param_specs = param_specs
        self._batch_specs = batch_specs
        if mesh is not None:
            if model_axis in mesh.axis_names:
                from .parallel.sharded import make_sharded_hf_step

                self._step = make_sharded_hf_step(
                    self.fns, config, self.ravel, mesh,
                    data_axis=data_axis, model_axis=model_axis,
                    param_specs=param_specs, batch_specs=batch_specs,
                    precond_exponent=config.precond_exponent, donate=True,
                )
            else:
                if param_specs is not None or batch_specs is not None:
                    raise ValueError(
                        "param_specs/batch_specs require a mesh with a "
                        f"{model_axis!r} axis."
                    )
                from .parallel.data_parallel import make_dp_hf_step

                self._step = make_dp_hf_step(
                    self.fns, config, self.ravel, mesh,
                    axis_name=data_axis,
                    precond_exponent=config.precond_exponent, donate=True,
                )
        else:
            if param_specs is not None or batch_specs is not None:
                raise ValueError("param_specs/batch_specs require mesh.")
            self._step = make_hf_step(
                self.fns, config, self.ravel,
                precond_exponent=config.precond_exponent, donate=True,
            )
        # Jitted step variants (acc steps keyed by (reduction, mvp_amortize),
        # custom-M steps keyed by closure identity), bounded LRU: cycling
        # through many distinct M closures or reductions in a long-lived
        # process evicts the oldest compiled program instead of leaking
        # executables (each entry pins its closure, incl. M, alive).
        import collections

        self._acc_steps: "collections.OrderedDict" = collections.OrderedDict()
        self._acc_steps_maxsize = 16
        self.last_stats: Optional[HFStats] = None
        self.history = {
            "init_losses": [],
            "final_losses": [],
            "dampings": [],
            "cg_reasons": [],
            "num_cg_iters": [],
            "best_cg_iters": [],
            "learning_rates": [],
        }

    # -- stepping ----------------------------------------------------------
    def _cached_step(self, key, build):
        """LRU lookup-or-build for jitted step variants (bounded)."""
        step = self._acc_steps.get(key)
        if step is None:
            step = build()
            self._acc_steps[key] = step
            while len(self._acc_steps) > self._acc_steps_maxsize:
                self._acc_steps.popitem(last=False)
        else:
            self._acc_steps.move_to_end(key)
        return step

    def clear_caches(self) -> None:
        """Drop all cached jitted step variants (acc steps and custom-M
        steps).  The primary step program is kept; variants recompile on
        next use."""
        self._acc_steps.clear()

    def _record(self, stats: HFStats) -> float:
        stats = jax.device_get(stats)
        h = self.history
        h["init_losses"].append(float(stats.init_loss))
        h["final_losses"].append(float(stats.final_loss))
        h["dampings"].append(float(stats.damping))
        h["cg_reasons"].append(
            cg_mod.CG_REASON_STRINGS[int(stats.cg_reason)]
        )
        h["num_cg_iters"].append(int(stats.num_cg_iters))
        h["best_cg_iters"].append(int(stats.best_cg_iter))
        h["learning_rates"].append(float(stats.lr))
        self.last_stats = stats
        if self.config.verbose:
            # One structured line per step -- the observability analog of the
            # reference's phase-by-phase prints (reference optimizer.py:197,
            # :226, :485-501; cg.py:202; linesearch.py:57-102), emitted after
            # the on-device step completes (printing inside jit would force
            # host syncs, the thing this design eliminates).
            flags = []
            if bool(stats.nonpos_curvature):
                flags.append("nonpos-curvature")
            if bool(stats.rho_negative):
                flags.append("rho<0")
            if bool(stats.linesearch_failed):
                flags.append("linesearch-failed")
            if bool(stats.not_descent_direction):
                flags.append("not-descent")
            print(
                f"[HF step {len(h['init_losses'])}]"
                f" loss {float(stats.init_loss):.6f} -> "
                f"{float(stats.final_loss):.6f} | damping "
                f"{float(stats.damping):.6f} -> {float(stats.new_damping):.6f}"
                f" (rho {float(stats.rho):.4f}) | cg "
                f"{int(stats.num_cg_iters)} iters "
                f"({cg_mod.CG_REASON_STRINGS[int(stats.cg_reason)]}) | best "
                f"iter {int(stats.best_cg_iter)} | lr {float(stats.lr):.6f}"
                + (f" | flags: {', '.join(flags)}" if flags else "")
            )
            if stats.detail is not None:
                print(format_rich_stats(stats))
        return float(stats.final_loss)

    def step(
        self,
        batch: Any,
        precond_diag: Optional[jax.Array] = None,
        test_deterministic: bool = False,
        M: Optional[Callable[[jax.Array], jax.Array]] = None,
        grad_vec: Optional[jax.Array] = None,
        mvp: Optional[Callable[[jax.Array], jax.Array]] = None,
        precond_lowrank: Optional[NystromSketch] = None,
    ) -> float:
        """One update step on ``batch``; returns the final mini-batch loss
        (reference optimizer.py:126-363).

        ``M``: arbitrary preconditioner matvec closure, the reference's
        ``M_func`` argument (reference optimizer.py:126-133).  The jitted
        step is cached per closure object; prefer ``precond_diag`` (one
        compiled program for any diagonal) when the preconditioner is
        diagonal.  Not combinable with ``mesh=``.

        ``precond_lowrank``: a :class:`NystromSketch` from
        :meth:`get_nystrom_sketch` -- low-rank ``(A + damping I)^{-1}``
        preconditioning built in-step with the live damping.  A dynamic
        operand like ``precond_diag`` (one compiled program per rank).
        Single-device only for now (not combinable with ``mesh=``).

        ``grad_vec`` / ``mvp``: user-supplied flat gradient / curvature
        matvec closure overriding the derived quantities -- the
        reference's ``step(grad=..., mvp=...)`` arguments (reference
        optimizer.py:129-131).  ``grad_vec`` is a dynamic operand (one
        compiled program for any vector); ``mvp`` is jitted per closure
        object like ``M``.  Single-device/DP only, like ``M``.
        """
        if test_deterministic:
            res = check_deterministic(
                self.fns, self.config, self.ravel, self.params, batch
            )
            if not all(res.values()):
                import warnings

                warnings.warn(
                    "Non-deterministic behaviour detected "
                    f"({res}). CG's quadratic model assumes a fixed batch "
                    "and deterministic model."
                )
        if precond_lowrank is not None:
            if (precond_diag is not None or M is not None
                    or mvp is not None or grad_vec is not None):
                raise ValueError(
                    "precond_lowrank cannot be combined with precond_diag, "
                    "M, mvp or grad_vec; build the preconditioner closure "
                    "explicitly (ops.nystrom.nystrom_to_preconditioner) and "
                    "pass it as M for custom compositions."
                )
            if self.mesh is not None:
                raise ValueError(
                    "precond_lowrank is not supported with mesh=; use the "
                    "functional hf_step with an explicit M closure + shard "
                    "hooks instead."
                )
        if M is not None or mvp is not None or grad_vec is not None:
            if M is not None and precond_diag is not None:
                raise ValueError("Pass either M or precond_diag, not both.")
            if self.mesh is not None:
                raise ValueError(
                    "Custom M/grad/mvp closures are not supported with "
                    "mesh=; use the functional hf_step with shard hooks "
                    "instead."
                )

            def _build_custom_step():
                fns, config, ravel = self.fns, self.config, self.ravel

                @functools.partial(
                    jax.jit, static_argnames=("use_gv", "use_precond")
                )
                def _c_step(params, state, batch, gv, use_gv,
                            precond_diag, use_precond):
                    return hf_step(
                        params, state, batch, fns=fns, config=config,
                        ravel=ravel, M=M,
                        precond_diag=(precond_diag if use_precond
                                      else None),
                        precond_exponent=config.precond_exponent,
                        grad_vec=gv if use_gv else None, mvp_vec=mvp,
                    )

                return _c_step

            key = (
                "custom",
                id(M) if M is not None else None,
                id(mvp) if mvp is not None else None,
            )
            c_step = self._cached_step(key, _build_custom_step)
            gv = (grad_vec if grad_vec is not None
                  else jnp.zeros((1,), self.ravel.dtype))
            pd, use_precond = precond_arg(precond_diag, self.ravel)
            self.params, self.state, stats = c_step(
                self.params, self.state, batch, gv,
                grad_vec is not None, pd, use_precond,
            )
            return self._record(stats)
        if precond_lowrank is not None:
            self.params, self.state, stats = self._step(
                self.params, self.state, batch, precond_diag,
                precond_lowrank=precond_lowrank,
            )
        else:
            self.params, self.state, stats = self._step(
                self.params, self.state, batch, precond_diag
            )
        return self._record(stats)

    def acc_step(
        self,
        loss_data,
        grad_data=None,
        mvp_data=None,
        reduction: str = "mean",
        precond_diag: Optional[jax.Array] = None,
        test_deterministic: bool = False,
        mvp_amortize: bool = False,
    ) -> float:
        """Accumulated step over mini-batch datalists
        (reference optimizer.py:519-606).  ``mvp_amortize=True`` linearizes
        the whole (stacked) mvp datalist once per step instead of per chunk
        per CG iteration -- see accumulate.make_acc_mvp."""
        if test_deterministic:
            from . import accumulate as acc

            chunks = acc._chunks(loss_data)
            res = check_deterministic(
                self.fns, self.config, self.ravel, self.params, chunks[0]
            )
            if not all(res.values()):
                import warnings

                warnings.warn(f"Non-deterministic behaviour detected ({res}).")
        cache_key = (reduction, mvp_amortize)
        if self.mesh is not None:
            # Mesh-sharded accumulation supports the single stacked datalist
            # form (use the functional API for independent grad/mvp lists).
            if grad_data is not None or mvp_data is not None:
                raise ValueError(
                    "acc_step with mesh= supports only loss_data (stacked); "
                    "use hf_acc_step / parallel.* builders for independent "
                    "grad/mvp datalists."
                )
            def _build_mesh_acc():
                if self._model_axis in self.mesh.axis_names:
                    from .parallel.sharded import make_sharded_hf_acc_step

                    return make_sharded_hf_acc_step(
                        self.fns, self.config, self.ravel, self.mesh,
                        data_axis=self._data_axis,
                        model_axis=self._model_axis,
                        param_specs=self._param_specs,
                        batch_specs=self._batch_specs,
                        reduction=reduction,
                        precond_exponent=self.config.precond_exponent,
                        mvp_amortize=mvp_amortize,
                    )
                from .parallel.data_parallel import make_dp_hf_acc_step

                return make_dp_hf_acc_step(
                    self.fns, self.config, self.ravel, self.mesh,
                    axis_name=self._data_axis,
                    reduction=reduction,
                    precond_exponent=self.config.precond_exponent,
                    mvp_amortize=mvp_amortize,
                )

            acc = self._cached_step(cache_key, _build_mesh_acc)
            self.params, self.state, stats = acc(
                self.params, self.state, loss_data,
                precond_diag=precond_diag,
            )
            return self._record(stats)
        acc = self._cached_step(
            cache_key,
            lambda: make_hf_acc_step(
                self.fns, self.config, self.ravel, reduction,
                precond_exponent=self.config.precond_exponent,
                mvp_amortize=mvp_amortize,
            ),
        )
        self.params, self.state, stats = acc(
            self.params,
            self.state,
            loss_data,
            grad_data=grad_data,
            mvp_data=mvp_data,
            precond_diag=precond_diag,
        )
        return self._record(stats)

    def train_steps(self, batches, precond_ema_decay=None):
        """Run T optimizer steps as ONE compiled ``lax.scan`` program (the
        stateful face of ``make_hf_train_loop``; no reference analog -- its
        training loops are host-side Python).

        ``batches``: stacked batch pytree with a leading steps axis
        (leaves ``[T, N, ...]``).  With ``mesh=``, the batch axis is
        sharded over the data axis (and the solver state over the model
        axis when present), exactly like :meth:`step`.

        ``precond_ema_decay``: carry an EMA empirical-Fisher diagonal
        across the scanned steps and precondition every CG solve with it;
        the EMA state persists on the optimizer across calls (epoch-by-
        epoch training does not restart it).

        Appends every step to :attr:`history` and returns the list of
        final losses (one per step).
        """
        key = ("train_loop", precond_ema_decay)

        def _build():
            if self.mesh is not None:
                if self._model_axis in self.mesh.axis_names:
                    from .parallel.sharded import make_sharded_hf_train_loop

                    return make_sharded_hf_train_loop(
                        self.fns, self.config, self.ravel, self.mesh,
                        data_axis=self._data_axis,
                        model_axis=self._model_axis,
                        param_specs=self._param_specs,
                        batch_specs=self._batch_specs,
                        precond_exponent=self.config.precond_exponent,
                        precond_ema_decay=precond_ema_decay,
                    )
                from .parallel.data_parallel import make_dp_hf_train_loop

                return make_dp_hf_train_loop(
                    self.fns, self.config, self.ravel, self.mesh,
                    axis_name=self._data_axis,
                    precond_exponent=self.config.precond_exponent,
                    precond_ema_decay=precond_ema_decay,
                )
            return make_hf_train_loop(
                self.fns, self.config, self.ravel,
                precond_exponent=self.config.precond_exponent,
                precond_ema_decay=precond_ema_decay,
            )

        loop = self._cached_step(key, _build)
        if precond_ema_decay is not None:
            # EMA state is keyed by decay: switching decay values
            # mid-training must not continue from another decay's diagonal
            # (each decay defines its own average). `_ema_state` mirrors the
            # most recent one for introspection/tests.
            states = getattr(self, "_ema_states", None)
            if states is None:
                states = self._ema_states = {}
            self.params, self.state, stats, ema = loop(
                self.params, self.state, batches,
                states.get(precond_ema_decay),
            )
            states[precond_ema_decay] = self._ema_state = ema
        else:
            self.params, self.state, stats = loop(
                self.params, self.state, batches
            )
        import numpy as np

        stats = jax.device_get(stats)
        h = self.history
        finals = []
        num_steps = int(np.asarray(stats.init_loss).shape[0])
        for i in range(num_steps):
            h["init_losses"].append(float(stats.init_loss[i]))
            h["final_losses"].append(float(stats.final_loss[i]))
            h["dampings"].append(float(stats.damping[i]))
            h["cg_reasons"].append(
                cg_mod.CG_REASON_STRINGS[int(stats.cg_reason[i])]
            )
            h["num_cg_iters"].append(int(stats.num_cg_iters[i]))
            h["best_cg_iters"].append(int(stats.best_cg_iter[i]))
            h["learning_rates"].append(float(stats.lr[i]))
            finals.append(float(stats.final_loss[i]))
        self.last_stats = stats
        return finals

    # -- preconditioning ----------------------------------------------------
    def get_preconditioner(
        self,
        inputs: jax.Array,
        targets: jax.Array,
        reduction: str,
        use_scan: bool = False,
    ) -> jax.Array:
        """Empirical-Fisher diagonal for this optimizer's model at the current
        params.  Returns the diagonal (pass it to :meth:`step` as
        ``precond_diag``); the ``(D + damping)^(-exponent)`` closure is built
        inside the jitted step with the *live* damping and
        ``config.precond_exponent`` (the reference's ``exponent`` argument,
        reference preconditioners.py:108).

        Note: the reference's method of the same name drops its return value
        and always yields ``None``, silently disabling preconditioning
        (reference optimizer.py:943-952) -- fixed here.

        With ``mesh=``, the per-sample gradients are computed with the batch
        sharded over the data axis (``parallel.dp_diag_EF``).
        """
        with config_mod.precision_ctx(self.config):
            if (
                self.mesh is not None
                and self._data_axis in self.mesh.axis_names
                and not use_scan
            ):
                from .parallel.data_parallel import dp_diag_EF

                return dp_diag_EF(
                    self.fns, self.params, inputs, targets, reduction,
                    self.ravel, self.mesh, axis_name=self._data_axis,
                )
            fn = diag_EF_scan if use_scan else diag_EF
            return fn(
                self.fns.model_fn,
                self.fns.loss_outer,
                self.params,
                inputs,
                targets,
                reduction,
                self.ravel,
                loss_reg=self.fns.loss_reg,
            )

    def get_nystrom_sketch(
        self,
        batch,
        *,
        rank: int = 32,
        key: Optional[jax.Array] = None,
        curvature: Optional[str] = None,
        seed: int = 0,
    ) -> NystromSketch:
        """Rank-``rank`` randomized Nystrom eigensketch of this optimizer's
        LIVE curvature operator (same params/batch/curvature configuration
        the step's CG solves against) -- feed to :meth:`step` as
        ``precond_lowrank`` for low-rank ``(A + damping I)^{-1}``
        preconditioning (ops/nystrom.py; no reference analog -- the
        reference's only preconditioner family is the diagonal EF,
        reference preconditioners.py:37-127).

        Cost: ``rank`` batched curvature matvecs (one linearization).  The
        sketch is reusable across steps while the curvature drifts slowly;
        rebuild every K steps like the EMA diagonal flow.

        Args:
            batch: One batch, same structure :meth:`step` takes.
            rank: Sketch rank (static; one compiled step program per rank).
            curvature: Override ``config.curvature_opt`` ("ggn"/"hessian").
                NOTE: the sketch assumes a PSD operator (GGN); on the
                Hessian path negative eigenvalues are clipped.
        """
        import dataclasses

        from .ops.nystrom import nystrom_sketch
        from .ops.spectrum import normalized_probes

        cfg = self.config
        if curvature is not None:
            cfg = dataclasses.replace(cfg, curvature_opt=curvature)
        if key is None:
            key = jax.random.PRNGKey(seed)
        probes = normalized_probes(
            key, rank, self.ravel.unpadded_dim, self.ravel.dtype,
            pad_to=self.ravel.dim if self.ravel.dim
            != self.ravel.unpadded_dim else None,
        )
        fns, ravel, params = self.fns, self.ravel, self.params

        with config_mod.precision_ctx(self.config):

            @jax.jit
            def run(params, batch, probes):
                _, _, mvp = _build_matvec_and_grad(
                    fns, cfg, ravel, params, batch
                )
                return nystrom_sketch(mvp, probes)

            return run(params, batch, probes)

    def estimate_spectrum(
        self,
        batch,
        *,
        num_iters: int = 32,
        num_probes: int = 0,
        key: Optional[jax.Array] = None,
        curvature: Optional[str] = None,
        seed: int = 0,
    ):
        """Spectral diagnostics of this optimizer's LIVE curvature operator
        (the exact matvec CG solves against: same params, same batch, same
        ``curvature_opt`` / ``curvature_dtype`` / ``remat`` configuration).

        No reference analog (SURVEY.md §2.3) -- answers the questions the
        quadratic model raises: is ``damping`` in the right decade relative
        to ``lambda_max``, is there negative curvature (Hessian path), what
        does the spectral bulk look like.

        Args:
            batch: One batch, same structure :meth:`step` takes.
            num_iters: Krylov dimension (static; extremal eigenvalues
                converge first, tens suffice for ``lambda_max``).
            num_probes: If > 0, additionally run SLQ with this many
                Rademacher probes and return the Gauss nodes/weights
                (feed to :func:`~pytorchhessianfree_tpu.slq_trace` /
                :func:`~pytorchhessianfree_tpu.slq_density` with
                ``dim = self.ravel.unpadded_dim``).
            key: PRNG key for start vector + probes (default: from ``seed``).
            curvature: Override ``config.curvature_opt`` ("ggn"/"hessian"),
                e.g. to probe the Hessian for saddles while training with
                the GGN.

        Returns:
            ``RitzResult`` (values descending, Kaniel-Paige residual bounds,
            start-vector weights), or ``(RitzResult, (nodes, weights))``
            when ``num_probes > 0``.
        """
        import dataclasses

        from .ops.spectrum import normalized_probes, ritz, slq

        cfg = self.config
        if curvature is not None:
            cfg = dataclasses.replace(cfg, curvature_opt=curvature)
        if key is None:
            key = jax.random.PRNGKey(seed)
        # Probes live in the unpadded subspace: the lane-alignment tail is
        # the operator's null space and must not enter the Krylov basis.
        probes = normalized_probes(
            key, 1 + num_probes, self.ravel.unpadded_dim, self.ravel.dtype,
            pad_to=self.ravel.dim if self.ravel.dim
            != self.ravel.unpadded_dim else None,
        )
        fns, ravel, params = self.fns, self.ravel, self.params

        with config_mod.precision_ctx(self.config):

            @jax.jit
            def run(params, batch, probes):
                _, _, mvp = _build_matvec_and_grad(
                    fns, cfg, ravel, params, batch
                )
                r = ritz(mvp, probes[0], num_iters)
                if num_probes:
                    return r, slq(mvp, probes[1:], num_iters)
                return r, None

            r, nw = run(params, batch, probes)
        return (r, nw) if num_probes else r

    # -- self-tests ----------------------------------------------------------
    def test_reduction(self, datalist, reduction: str) -> None:
        """Raise if the loss function's reduction does not match ``reduction``
        (reference optimizer.py:817-926)."""
        check_reduction(
            self.fns, self.config, self.ravel, self.params, datalist, reduction
        )

    def test_deterministic(
        self, batch, fns_factory=None, batch_factory=None
    ) -> dict:
        """See :func:`check_deterministic`; pass ``fns_factory(key)`` to
        detect RNG-consuming (e.g. dropout) models and ``batch_factory()``
        to check data-pipeline reproducibility."""
        return check_deterministic(
            self.fns, self.config, self.ravel, self.params, batch,
            fns_factory=fns_factory, batch_factory=batch_factory,
        )

    # -- checkpointing -------------------------------------------------------
    def state_dict(self) -> dict:
        """Serializable snapshot: optimizer state pytree + history
        (the analog of ``torch.optim.Optimizer.state_dict()``,
        reference examples/run_small_nn.py:46-52)."""
        return {
            "state": jax.device_get(self.state)._asdict(),
            # deep-copy the lists: the snapshot must not grow as training
            # continues (and loading must not alias the snapshot's lists)
            "history": {k: list(v) for k, v in self.history.items()},
            "step_count": int(self.state.step_count),
        }

    def load_state_dict(self, sd: dict) -> None:
        s = sd["state"]
        self.state = HFState(
            x0=jnp.asarray(s["x0"]),
            damping=jnp.asarray(s["damping"]),
            step_count=jnp.asarray(s["step_count"], jnp.int32),
        )
        self.history.update(
            {k: list(v) for k, v in sd.get("history", {}).items()}
        )

    def save(self, path: str, backend: str = "orbax") -> None:
        """Checkpoint params + optimizer state + history (see checkpoint.py)."""
        from . import checkpoint as ckpt

        if backend == "orbax":
            ckpt.save(path, self.params, self.state, self.history)
        else:
            ckpt.save_npz(path, self.params, self.state, self.history)

    def load(self, path: str, backend: str = "orbax") -> None:
        """Restore a checkpoint written by :meth:`save` (params, optimizer
        state and history); training continues bit-identically."""
        from . import checkpoint as ckpt

        if backend == "orbax":
            params, state, history = ckpt.restore(path)
        else:
            params, state, history = ckpt.restore_npz(path, self.params)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.state = state
        self.history.update(history)
