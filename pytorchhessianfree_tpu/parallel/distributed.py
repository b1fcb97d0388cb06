"""Multi-host initialization helpers.

The reference has no distributed runtime at all (SURVEY.md 2.3); on TPU pods
the runtime is simply JAX's: every host runs the same program,
``jax.distributed.initialize`` wires the hosts together, and the same
``Mesh``-based data-parallel steps from :mod:`.data_parallel` scale across
hosts -- XLA routes intra-slice collectives over ICI and cross-slice ones
over DCN without code changes.

These helpers keep that one-liner discoverable and make single-host runs
(e.g. CI, the virtual CPU mesh) no-ops.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime.

    On TPU pods with standard orchestration (GKE/TPU-VM metadata) all
    arguments are auto-detected and this is ``jax.distributed.initialize()``.
    No-op when the process group is already initialized.

    Must run BEFORE any operation that initializes a JAX backend
    (``jax.devices()``, ``jax.process_count()``, any computation) -- the
    runtime cannot be re-wired afterwards.  For that reason the
    already-initialized probe inspects the distributed client directly
    instead of calling ``jax.process_count()`` (which would itself
    initialize a single-process backend and make the subsequent
    ``initialize`` silently impossible).

    With explicit arguments a failure RAISES (a requested multi-process
    layout that cannot form is a real error); with no arguments it is
    best-effort and stays single-process when no coordinator is detected.
    """
    try:
        # Public signal first (jax >= 0.4.34); it does not initialize a
        # backend.  Keep the private-state probe as a fallback for older
        # versions where the public predicate does not exist.
        if jax.distributed.is_initialized():
            return  # already wired
    except AttributeError:
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is not None:
                return  # already wired
        except Exception:
            pass  # private-API drift: fall through to initialize
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            # Idempotency guard independent of the private-state probe
            # above: a repeat call is fine, anything else is a real error.
            if "already initialized" not in str(e).lower():
                raise
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environments (no coordinator) stay single-process
        pass


def global_batch_slice(
    global_batch_size: int,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
) -> slice:
    """The slice of a global batch this process should load.

    With the batch sharded over the ``data`` mesh axis, each host feeds only
    its local shard (``jax.make_array_from_process_local_data`` handles the
    assembly); this helper gives the per-process row range for simple
    contiguous layouts.  ``process_count``/``process_index`` default to the
    live JAX process layout and exist so multi-host layouts are testable
    (and wrong layouts fail loudly) without a real pod.
    """
    pc = jax.process_count() if process_count is None else int(process_count)
    pi = jax.process_index() if process_index is None else int(process_index)
    if pc < 1 or not 0 <= pi < pc:
        raise ValueError(f"Invalid process layout: index {pi} of {pc}")
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global_batch_size {global_batch_size} is not divisible by "
            f"process_count {pc}; every host must feed an equal shard"
        )
    per = global_batch_size // pc
    start = per * pi
    return slice(start, start + per)
