"""Configuration for the TPU-native Hessian-free optimizer.

The reference (ltatzel/PyTorchHessianFree) configures the optimizer through
``HessianFree.__init__`` keyword arguments validated eagerly
(reference: hessianfree/optimizer.py:23-123).  Here the same nine knobs (plus
solver sub-configs) live in frozen, hashable dataclasses so the entire
optimizer step can be staged through ``jax.jit`` with the config as a static
argument.  Defaults match the reference exactly:

- ``curvature_opt="ggn"``, ``damping=1.0``, ``adapt_damping=True``,
  ``cg_max_iter=250``, ``cg_decay_x0=0.95``, ``use_cg_backtracking=True``,
  ``lr=1.0``, ``use_linesearch=True`` (reference optimizer.py:23-35);
- CG: ``tol=1e-5`` (reference cg.py:16), storage-grid ``gamma=1.3``
  (reference cg.py:152), Martens relative-progress threshold ``5e-4``
  (reference cg.py:102);
- line search: ``beta=0.8``, ``c=1e-2``, ``max_iter=20``
  (reference linesearch.py:8-16).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CGConfig:
    """Hyperparameters of the preconditioned-CG inner solver.

    Mirrors the keyword arguments of the reference ``cg`` function
    (reference cg.py:9-20) that are not supplied per-call by the optimizer.
    """

    tol: float = 1e-5
    atol: Optional[float] = None
    martens_threshold: float = 5e-4  # reference cg.py:102
    martens_min_window: int = 10  # k = max(10, iter // 10), reference cg.py:98
    grid_gamma: float = 1.3  # storage grid ceil(gamma^j) - 1, reference cg.py:152
    # "ignore" keeps non-positive directional curvature, "saddle-free" takes
    # its absolute value (reference cg.py:123-147).
    nonpos_curv_option: str = "ignore"
    # Optional reduced-precision dtype (e.g. "bfloat16") for the stored
    # backtracking iterates: the [G, n] buffer is carried through every CG
    # iteration, so halving it halves that HBM traffic.  Candidates are cast
    # back on read; the selected update step is bf16-rounded (opt-in).
    store_dtype: Optional[str] = None
    # Iterate-buffer layout: "flat" keeps stored iterates in one 1-D buffer
    # (layout-identical dynamic_update_slice writes); "rows" uses a [G+1, n]
    # buffer.  Performance-only knob; results are identical.
    buffer_layout: str = "flat"
    # Off-grid iteration handling for the iterate store: "cond" (default)
    # skips the store via lax.cond whose false branch is the identity --
    # one fewer n-vector HBM write on the (majority) off-grid iterations,
    # measured 16% faster ResNet-18 steps in-process with bit-identical
    # results (BENCH_DETAILS.md, benchmarks/store_mode_bench.py);
    # "scratch" writes every iterate (off-grid ones into a dead scratch
    # row -- read-free scatter).
    store_mode: str = "cond"

    def __post_init__(self):
        if self.buffer_layout not in ("flat", "rows"):
            raise ValueError(f"Unknown buffer_layout {self.buffer_layout}")
        if self.store_mode not in ("scratch", "cond"):
            raise ValueError(f"Unknown store_mode {self.store_mode}")
        if self.grid_gamma <= 1.0:
            # match storing_grid's bound: gamma == 1.0 would make the
            # ceil(gamma^j)-1 grid degenerate (log base 1)
            raise ValueError(f"Invalid gamma = {self.grid_gamma}")
        if self.nonpos_curv_option not in ("ignore", "saddle-free"):
            raise ValueError(f"Unknown option {self.nonpos_curv_option}.")


@dataclasses.dataclass(frozen=True)
class LineSearchConfig:
    """Armijo backtracking line-search hyperparameters
    (reference linesearch.py:8-16)."""

    beta: float = 0.8
    c: float = 1e-2
    max_iter: int = 20
    # "sequential" reproduces the reference's early-exit loop as a
    # lax.while_loop; "batched" evaluates every candidate step size in one
    # vmapped forward sweep (mathematically identical selection: the largest
    # alpha satisfying the Armijo condition wins either way) and is usually
    # faster on TPU for small models.
    mode: str = "sequential"
    # In batched mode, evaluate candidates in vmapped chunks of this size
    # (bounds peak memory to batch_chunk trial parameter sets); None = all
    # max_iter candidates in one sweep.
    batch_chunk: Optional[int] = None

    def __post_init__(self):
        if self.beta >= 1.0:
            raise ValueError(f"Invalid reduction factor beta = {self.beta}")
        if self.c < 0.0:
            raise ValueError(f"Invalid c = {self.c}")
        if self.mode not in ("sequential", "batched"):
            raise ValueError(f"Unknown line-search mode {self.mode}")
        # the three implementations (sequential / batched / fused) only
        # agree for a positive trial budget
        if self.max_iter < 1:
            raise ValueError(f"Invalid line-search max_iter {self.max_iter}")


def precision_ctx(config: "HFConfig"):
    """Context manager applying ``config.matmul_precision`` (no-op when
    unset).  Used by every traced compute site: the step core wraps itself,
    and the train-loop bodies wrap their in-body ``diag_EF`` so the EMA
    preconditioner construction sees the same MXU precision as the step."""
    import contextlib

    import jax

    if config.matmul_precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(config.matmul_precision)


@dataclasses.dataclass(frozen=True)
class HFConfig:
    """Top-level Hessian-free optimizer configuration.

    Field-for-field analog of ``HessianFree.__init__``
    (reference optimizer.py:23-35).  ``damping`` here is only the *initial*
    damping; the live (LM-adapted) value is carried in :class:`HFState`.
    """

    curvature_opt: str = "ggn"
    damping: float = 1.0
    adapt_damping: bool = True
    cg_max_iter: Optional[int] = 250
    cg_decay_x0: float = 0.95
    use_cg_backtracking: bool = True
    lr: float = 1.0
    use_linesearch: bool = True
    verbose: bool = False
    # Fuse all trial-loss evaluations (LM f(warm start), the backtracking
    # reverse walk, the Armijo line search) into ONE while_loop whose body
    # contains a single traced forward pass (ops.select.fused_trials).
    # Identical evaluation points and selections -- this is a COMPILE-time
    # optimization (one forward graph in the step program instead of four),
    # applied whenever both select modes are "sequential".  Disable to fall
    # back to the standalone loops (e.g. for profiling them separately).
    fused_trials: bool = True
    # Opt-in solver-depth observability: the step's HFStats gains a `detail`
    # record (HFDetail) with the CG m-history, the evaluated backtracking
    # candidates and the line-search alpha trace -- the data behind the
    # reference's verbose per-iteration lines / tables (reference
    # cg.py:202-203, cg_backtracking.py:100-110, linesearch.py:57-102),
    # collected on-device with zero extra forwards.  `format_rich_stats`
    # pretty-prints it in the reference's table style.
    rich_stats: bool = False
    # Unlike the reference -- which only evaluates the post-update loss when
    # `verbose` or when the line search already produced it
    # (reference optimizer.py:329, :353-356) -- we always report a final loss
    # in the step stats when this flag is set (documented deviation).
    compute_final_loss: bool = True
    # "sequential" walks the CG iterates in reverse with early exit, exactly
    # like `cg_efficient_backtracking` (reference cg_backtracking.py:53-112);
    # "batched" evaluates all stored iterates in one vmapped sweep and then
    # applies the identical reverse-walk selection rule on-device.
    backtracking_mode: str = "sequential"
    # Optional reduced-precision dtype (e.g. "bfloat16") for the curvature
    # matvec ONLY: the model is cast for the per-CG-iteration Gv/Hv products
    # (MXU-friendly), while the loss, gradient (CG right-hand side) and all
    # CG vector arithmetic stay in the parameter dtype.  CG tolerates modest
    # matvec noise (the damping absorbs it); None = full precision.
    curvature_dtype: Optional[str] = None
    # Rematerialization: wrap the model forward in jax.checkpoint so the
    # linearization/VJP residuals are recomputed instead of stored --
    # trades FLOPs for activation memory (the standard TPU lever for
    # activation-bound models at large batch; see DESIGN.md's measured
    # regimes).  Numerics identical; wall-clock rises by roughly one
    # forward recompute per gradient/matvec.
    remat: bool = False
    # MXU multiplier precision for every matmul/conv traced inside the step
    # (None = XLA default).  Measured on a v5e (benchmarks/
    # cost_analysis_probe.py --big, ResNet-18 b512 matvec chain): the
    # DEFAULT f32 path runs within 7% of bf16 wall-clock while "highest"
    # is 1.95x slower -- i.e. f32 *storage* gets bf16-class multiplier
    # passes by default.  Set "highest" for true-f32 curvature products
    # (e.g. ill-conditioned problems where matvec noise exceeds what the
    # damping absorbs), "default" to pin today's behavior explicitly.
    matmul_precision: Optional[str] = None
    # Automatic preconditioning: "none" (pass precond_diag/M explicitly, the
    # reference's manual get_preconditioner flow) or "diag_ef" -- compute the
    # empirical-Fisher diagonal from the step's own batch INSIDE the jitted
    # step (vmap'ed per-sample grads) and apply Martens'
    # (D + damping)^(-exponent) preconditioner with the live damping.
    # Requires the split model form.
    precond: str = "none"
    precond_exponent: float = 0.75  # reference preconditioners.py:108
    precond_reduction: str = "mean"  # must match the loss's reduction
    cg: CGConfig = dataclasses.field(default_factory=CGConfig)
    linesearch: LineSearchConfig = dataclasses.field(
        default_factory=LineSearchConfig
    )

    def __post_init__(self):
        # Eager validation, mirroring reference optimizer.py:80-101.
        if self.curvature_opt not in ("hessian", "ggn"):
            raise ValueError(f"Invalid curvature_opt = {self.curvature_opt}")
        if self.damping < 0.0:
            raise ValueError(f"Invalid damping = {self.damping}")
        if self.damping == 0.0 and self.adapt_damping:
            # The reference silently flips adapt_damping off with a warning
            # (reference optimizer.py:88-90).
            warnings.warn("The damping is set to `0.0` and won't get adapted.")
            object.__setattr__(self, "adapt_damping", False)
        if self.cg_max_iter is not None and self.cg_max_iter < 1:
            raise ValueError(f"Invalid cg_max_iter: {self.cg_max_iter}")
        if self.lr < 0.0:
            raise ValueError(f"Invalid learning rate lr = {self.lr}")
        if self.backtracking_mode not in ("sequential", "batched"):
            raise ValueError(
                f"Unknown backtracking mode {self.backtracking_mode}"
            )
        if self.precond not in ("none", "diag_ef"):
            raise ValueError(f"Unknown precond option {self.precond}")
        if self.matmul_precision is not None and self.matmul_precision not in (
            "default",
            "high",
            "highest",
        ):
            raise ValueError(
                f"Unknown matmul_precision {self.matmul_precision}"
            )
