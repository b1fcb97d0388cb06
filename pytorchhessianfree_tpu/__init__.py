"""pytorchhessianfree_tpu -- a TPU-native Hessian-free optimization framework.

Ground-up JAX/XLA rebuild of the capabilities of ltatzel/PyTorchHessianFree
(Martens' Hessian-free optimizer with GGN/Hessian matvecs, preconditioned CG
with Martens' termination criterion, Levenberg-Marquardt damping,
CG-backtracking and Armijo line search), redesigned TPU-first: the entire
optimizer step -- including every trial forward pass of the backtracking and
line-search loops -- compiles into a single XLA program with zero host
round-trips, and batch scaling maps onto `jax.sharding` data parallelism
instead of sequential accumulation.
"""

from .config import CGConfig, HFConfig, LineSearchConfig
from .ops.cg import CG_REASON_STRINGS, CGResult, cg, cg_reason_str, storing_grid
from .ops.curvature import ggnvp_fn, hvp_fn
from .ops.precond import (
    EMADiag,
    diag_EF,
    diag_EF_preconditioner,
    diag_EF_scan,
    diag_to_preconditioner,
)
from .ops.nystrom import (
    NystromSketch,
    nystrom_sketch,
    nystrom_to_preconditioner,
)
from .ops.spectrum import (
    LanczosResult,
    RitzResult,
    lanczos,
    normalized_probes,
    ritz,
    slq,
    slq_density,
    slq_trace,
)
from .ops.select import (
    BacktrackResult,
    LinesearchResult,
    cg_backtracking,
    cg_efficient_backtracking,
    simple_linesearch,
)
from . import checkpoint
from .accumulate import (
    StackedData,
    acc_grad,
    acc_loss,
    acc_reduce,
    make_acc_mvp,
    pad_ragged_datalist,
    weighted_fns,
)
from .optimizer import (
    HessianFree,
    HFDetail,
    HFModelFns,
    HFState,
    HFStats,
    check_deterministic,
    check_reduction,
    format_rich_stats,
    hf_acc_step,
    hf_step,
    init_state,
    make_hf_acc_step,
    make_hf_step,
    make_hf_train_loop,
)
from .interop import (
    flax_fns,
    flax_state_update,
    haiku_fns,
    haiku_state_update,
    split_flax_variables,
)
from .utils.flatten import TrainableRavel

__version__ = "0.1.0"

__all__ = [
    "CGConfig",
    "HFConfig",
    "LineSearchConfig",
    "CG_REASON_STRINGS",
    "CGResult",
    "cg",
    "cg_reason_str",
    "storing_grid",
    "ggnvp_fn",
    "hvp_fn",
    "diag_EF",
    "diag_EF_preconditioner",
    "diag_EF_scan",
    "diag_to_preconditioner",
    "BacktrackResult",
    "LinesearchResult",
    "cg_backtracking",
    "cg_efficient_backtracking",
    "simple_linesearch",
    "NystromSketch",
    "nystrom_sketch",
    "nystrom_to_preconditioner",
    "LanczosResult",
    "RitzResult",
    "lanczos",
    "normalized_probes",
    "ritz",
    "slq",
    "slq_density",
    "slq_trace",
    "HessianFree",
    "HFModelFns",
    "HFState",
    "HFStats",
    "HFDetail",
    "format_rich_stats",
    "check_deterministic",
    "check_reduction",
    "checkpoint",
    "hf_acc_step",
    "hf_step",
    "init_state",
    "make_hf_acc_step",
    "make_hf_step",
    "make_hf_train_loop",
    "acc_grad",
    "acc_loss",
    "acc_reduce",
    "StackedData",
    "make_acc_mvp",
    "pad_ragged_datalist",
    "weighted_fns",
    "EMADiag",
    "TrainableRavel",
    "flax_fns",
    "flax_state_update",
    "haiku_fns",
    "haiku_state_update",
    "split_flax_variables",
]
