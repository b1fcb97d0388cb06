"""Native prefetch loader tests: build, determinism, epoch coverage."""

import numpy as np
import pytest

from pytorchhessianfree_tpu.runtime import PrefetchLoader


def _dataset(n=64, d=5):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    # encode the sample index in the target so coverage can be checked
    y = np.arange(n, dtype=np.float32).reshape(n, 1)
    return x, y


def test_shapes_and_epoch_coverage():
    x, y = _dataset(n=64)
    loader = PrefetchLoader(x, y, batch_size=16, seed=7)
    assert loader.batches_per_epoch == 4

    seen = []
    for _ in range(loader.batches_per_epoch):
        bx, by = loader.next_batch()
        assert bx.shape == (16, 5)
        assert by.shape == (16, 1)
        seen.extend(int(v) for v in by[:, 0])
    # one epoch = exactly one visit per sample, in shuffled order
    assert sorted(seen) == list(range(64))
    assert seen != list(range(64)), "batches were not shuffled"
    # batch rows carry the matching inputs
    np.testing.assert_array_equal(bx[0], x[int(by[0, 0])])
    loader.close()


def test_deterministic_given_seed():
    x, y = _dataset()
    a = PrefetchLoader(x, y, batch_size=8, seed=123)
    b = PrefetchLoader(x, y, batch_size=8, seed=123)
    for _ in range(10):
        xa, ya = a.next_batch()
        xb, yb = b.next_batch()
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    a.close()
    b.close()


def test_epochs_reshuffle():
    x, y = _dataset(n=32)
    loader = PrefetchLoader(x, y, batch_size=8, seed=1)
    e1 = [
        int(v)
        for _ in range(4)
        for v in loader.next_batch()[1][:, 0]
    ]
    e2 = [
        int(v)
        for _ in range(4)
        for v in loader.next_batch()[1][:, 0]
    ]
    assert sorted(e1) == sorted(e2) == list(range(32))
    assert e1 != e2, "epoch 2 must be reshuffled"
    loader.close()


def test_invalid_config_raises():
    x, y = _dataset(n=8)
    with pytest.raises(ValueError):
        PrefetchLoader(x, y, batch_size=16)  # batch > n
    with pytest.raises(ValueError):
        PrefetchLoader(x, y[:4], batch_size=2)  # row mismatch


def test_labels_as_int():
    x, y = _dataset(n=16)
    loader = PrefetchLoader(
        x, y, batch_size=4, seed=0, labels_as_int=True
    )
    _, by = loader.next_batch()
    assert by.dtype == np.int32
    loader.close()


def test_native_int_labels_no_roundtrip():
    """Integer targets pass through natively (byte-span rows) -- no float32
    round-trip (VERDICT r1 next-round #8)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 3)).astype(np.float32)
    y = np.arange(32, dtype=np.int64)
    loader = PrefetchLoader(x, y, batch_size=8, seed=5)
    seen = []
    for _ in range(loader.batches_per_epoch):
        bx, by = loader.next_batch()
        assert by.dtype == np.int64
        assert bx.dtype == np.float32
        seen.extend(int(v) for v in by)
        # rows still correspond
        np.testing.assert_array_equal(bx[0], x[int(by[0])])
    assert sorted(seen) == list(range(32))
    loader.close()


def test_mmap_backed_dataset(tmp_path):
    """PrefetchLoader.from_npy gathers rows straight from memory-mapped
    files -- no up-front copy of the dataset into RAM."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((48, 6)).astype(np.float32)
    y = np.arange(48, dtype=np.int32)
    xp, yp = str(tmp_path / "x.npy"), str(tmp_path / "y.npy")
    np.save(xp, x)
    np.save(yp, y)

    loader = PrefetchLoader.from_npy(xp, yp, batch_size=12, seed=4)
    # genuinely mapped: the loader's array is the memmap (or a no-copy view)
    src = loader._inputs
    assert isinstance(src, np.memmap) or isinstance(src.base, np.memmap)
    seen = []
    for _ in range(loader.batches_per_epoch):
        bx, by = loader.next_batch()
        seen.extend(int(v) for v in by)
        np.testing.assert_array_equal(bx[0], x[int(by[0])])
    assert sorted(seen) == list(range(48))
    loader.close()


def test_device_prefetcher():
    """DevicePrefetcher yields batches already on device, same values, and
    stops after n_batches."""
    import jax

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    x, y = _dataset(n=32)
    loader = PrefetchLoader(x, y, batch_size=8, seed=9)
    ref = PrefetchLoader(x, y, batch_size=8, seed=9)

    with DevicePrefetcher(loader, depth=2, n_batches=6) as pf:
        batches = list(pf)
    assert len(batches) == 6
    for bx, by in batches:
        assert isinstance(bx, jax.Array) and isinstance(by, jax.Array)
        rx, ry = ref.next_batch()
        np.testing.assert_array_equal(np.asarray(bx), rx)
        np.testing.assert_array_equal(np.asarray(by), ry)
    loader.close()
    ref.close()


def test_device_prefetcher_sharded():
    """The background transfer can lay out data-parallel shards directly."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))

    x, y = _dataset(n=32)
    loader = PrefetchLoader(x, y, batch_size=16, seed=2)
    with DevicePrefetcher(loader, sharding=shard, n_batches=2) as pf:
        bx, by = next(pf)
        assert bx.sharding.spec == P("data")
        assert by.sharding.spec == P("data")
    loader.close()


def test_device_prefetcher_stopiteration_repeats():
    """Exhausted prefetcher raises StopIteration on EVERY subsequent next()
    (iterator protocol) instead of busy-waiting forever."""
    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    x, y = _dataset(n=16)
    loader = PrefetchLoader(x, y, batch_size=8, seed=1)
    pf = DevicePrefetcher(loader, n_batches=2)
    assert len(list(pf)) == 2
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(pf)
    pf.close()
    loader.close()


def test_device_prefetcher_error_propagates():
    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    def bad_source():
        yield (np.zeros((2, 2)), np.zeros((2,)))
        raise RuntimeError("boom")

    pf = DevicePrefetcher(bad_source(), depth=2)
    # the error may surface before or after the one good batch is consumed
    with pytest.raises(RuntimeError, match="boom"):
        for _ in pf:
            pass
    # the source error is sticky: re-raised on every subsequent __next__
    # and readable via .error, so a failed stream can never be mistaken
    # for a cleanly exhausted one (even by a consumer that closed early).
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
    assert isinstance(pf.error, RuntimeError)
    pf.close()
    assert isinstance(pf.error, RuntimeError)
    # repeated polls must NOT grow the shared exception's traceback (each
    # re-raise resets to the worker-captured traceback)
    import traceback

    def tb_len():
        try:
            next(pf)
        except RuntimeError as e:
            return len(traceback.extract_tb(e.__traceback__))

    first = tb_len()
    for _ in range(5):
        last = tb_len()
    assert last == first


def test_device_prefetcher_genuine_error_racing_close_is_recorded():
    """A REAL source error (e.g. data corruption) that raises concurrently
    with close() must not be reclassified as a clean shutdown: it stays
    readable via .error for post-mortems.  Only the expected shutdown
    sentinel is swallowed (next test)."""
    import threading

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    release = threading.Event()

    def source():
        yield (np.zeros((2, 2)), np.zeros((2,)))
        # the worker parks here until the test has called close() (which
        # sets _stop) and THEN releases it -- a deterministic raise-after-
        # close ordering with no dependence on thread scheduling
        release.wait(10)
        raise OSError("disk corruption")

    pf = DevicePrefetcher(source(), depth=1)
    next(pf)  # worker is now blocked inside the second source read
    # close() sets _stop in its FIRST statement; the 0.5 s delayed release
    # makes the worker's raise strictly follow it without stalling close()'s
    # internal join for the full park
    threading.Timer(0.5, release.set).start()
    pf.close()
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()
    assert isinstance(pf.error, OSError)


def test_device_prefetcher_shutdown_sentinel_racing_close_is_clean():
    """The PrefetchLoader -1 sentinel (RuntimeError 'shutting down') raised
    because close() unblocked the read IS a clean stop: no sticky error."""
    import threading

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    release = threading.Event()

    def source():
        yield (np.zeros((2, 2)), np.zeros((2,)))
        release.wait(10)
        raise RuntimeError("PrefetchLoader is shutting down")

    pf = DevicePrefetcher(source(), depth=1)
    next(pf)
    threading.Timer(0.5, release.set).start()
    pf.close()
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()
    assert pf.error is None


def test_device_prefetcher_close_skips_source_close_when_worker_stuck():
    """close(close_source=True) must NOT free the source while the worker
    thread is still blocked inside it (native use-after-free hazard);
    it warns and defers instead."""
    import threading
    import warnings

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    release = threading.Event()
    closed = []

    class BlockingSource:
        def __iter__(self):
            return self

        def __next__(self):
            release.wait()  # simulates a blocked native next_batch call
            raise StopIteration

        def close(self):
            closed.append(True)

    src = BlockingSource()
    pf = DevicePrefetcher(src, depth=1, close_source=True)
    # patch the join timeout down so the test doesn't sit for 5s
    real_join = pf._thread.join
    pf._thread.join = lambda timeout=None: real_join(timeout=0.2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pf.close()
    assert closed == []  # source.close() was NOT called
    assert any("skipping source.close" in str(x.message) for x in w)
    release.set()  # unblock; worker exits, source closes via its own path
    pf._thread.join = real_join
    pf._thread.join(timeout=2.0)


def test_many_threads_epoch_coverage():
    """With several producer threads the (now unserialized) gathers must
    still deliver batches in global order with exact epoch coverage."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((128, 4)).astype(np.float32)
    y = np.arange(128, dtype=np.int32)
    loader = PrefetchLoader(
        x, y, batch_size=16, seed=3, depth=6, num_threads=4
    )
    for _ in range(3):  # three epochs
        seen = []
        for _ in range(loader.batches_per_epoch):
            _, by = loader.next_batch()
            seen.extend(int(v) for v in by)
        assert sorted(seen) == list(range(128))
    loader.close()


def test_npy_to_prefetcher_to_hf_step_end_to_end(tmp_path):
    """The full real-data path the examples' --data flag wires up:
    mmap .npy -> C++ PrefetchLoader -> DevicePrefetcher -> jitted HF step.
    Locks the plumbing the flagship workloads use for real datasets."""
    import jax
    import jax.numpy as jnp

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_step,
    )
    from pytorchhessianfree_tpu.models import init_mlp, mlp_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss
    from pytorchhessianfree_tpu.runtime.loader import PrefetchLoader
    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    rng = np.random.default_rng(0)
    xp = str(tmp_path / "train_x.npy")
    yp = str(tmp_path / "train_y.npy")
    np.save(xp, rng.standard_normal((64, 7)).astype(np.float32))
    np.save(yp, rng.standard_normal((64, 3)).astype(np.float32))

    params = init_mlp(jax.random.PRNGKey(0), dtype=jnp.float32)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=5)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)

    loader = PrefetchLoader.from_npy(xp, yp, batch_size=16, seed=1)
    losses = []
    with DevicePrefetcher(loader, depth=2, n_batches=3) as pf:
        for batch in pf:
            x, y = batch
            assert isinstance(x, jax.Array)  # already on device
            assert x.shape == (16, 7) and y.shape == (16, 3)
            params, state, stats = step(params, state, batch)
            losses.append(float(stats.init_loss))
    loader.close()
    assert len(losses) == 3
    assert all(np.isfinite(v) for v in losses)
    assert int(state.step_count) == 3


def test_device_prefetcher_stop_hook_unblocks_worker_then_closes_source():
    """A source exposing stop() (the PrefetchLoader protocol) lets close()
    unblock a worker parked inside the source's blocking read, join it, and
    then REALLY close the source -- no warning, no deferred-to-GC leak (r4
    review finding: the previous skip left the native handle and worker
    leaked forever in exactly the shutdown path hfb_stop/hfb_destroy were
    designed for)."""
    import threading
    import warnings

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    release = threading.Event()
    closed, stopped = [], []

    class StoppableBlockingSource:
        def __iter__(self):
            return self

        def __next__(self):
            release.wait()
            # mirrors PrefetchLoader.next_batch after stop(): the native
            # call returns the -1 sentinel -> RuntimeError
            raise RuntimeError("PrefetchLoader is shutting down")

        def stop(self):
            stopped.append(True)
            release.set()

        def close(self):
            closed.append(True)

    pf = DevicePrefetcher(
        StoppableBlockingSource(), depth=1, close_source=True
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pf.close()
    assert stopped == [True]
    assert closed == [True]
    assert not any(
        isinstance(x.message, RuntimeWarning) for x in w
    ), [str(x.message) for x in w]
    # the shutdown-race error must NOT be recorded as a sticky stream error
    assert pf.error is None


def test_prefetch_loader_stop_then_close():
    """stop() invalidates reads (RuntimeError sentinel) while keeping the
    handle alive; close() afterwards frees it."""
    x, y = _dataset(16, 3)
    loader = PrefetchLoader(x, y, batch_size=4, depth=2)
    xb, _ = loader.next_batch()
    assert xb.shape == (4, 3)
    loader.stop()
    with pytest.raises(RuntimeError, match="shutting down"):
        loader.next_batch()
    assert loader._h is not None  # stop does not free
    loader.close()
    assert loader._h is None


def test_device_prefetcher_over_loader_closes_native_handle():
    """End to end over the real native loader: close(close_source=True)
    must stop+join+destroy promptly, leaving the handle freed."""
    import warnings

    from pytorchhessianfree_tpu.runtime.prefetch import DevicePrefetcher

    x, y = _dataset(64, 5)
    loader = PrefetchLoader(x, y, batch_size=8, depth=2)
    pf = DevicePrefetcher(loader, depth=2, close_source=True)
    next(pf)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pf.close()
    assert loader._h is None
    assert not any(isinstance(x.message, RuntimeWarning) for x in w)
    assert not pf._thread.is_alive()
