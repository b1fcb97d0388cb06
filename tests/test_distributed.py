"""Multi-host helper tests (single-process behavior)."""

import jax

from pytorchhessianfree_tpu.parallel.distributed import (
    global_batch_slice,
    initialize_distributed,
)


def test_initialize_is_noop_single_process():
    initialize_distributed()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_global_batch_slice_single_process():
    s = global_batch_slice(64)
    assert (s.start, s.stop) == (0, 64)
