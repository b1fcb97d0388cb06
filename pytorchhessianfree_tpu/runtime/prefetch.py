"""Device-transfer prefetching: overlap host->device copies with compute.

The native batcher (runtime/src/batcher.cpp) overlaps batch *assembly* with
device execution; this module overlaps the remaining host->device transfer
too.  A background thread pulls batches from any iterator (typically a
:class:`~pytorchhessianfree_tpu.runtime.loader.PrefetchLoader`), calls
``jax.device_put`` -- optionally with a ``Sharding`` so multi-device layouts
are formed during the overlap, not on the critical path -- and parks the
resulting device arrays in a bounded queue.  While the optimizer step for
batch *k* runs on the TPU, batch *k+1*'s DMA is already in flight: consuming
a batch is a queue pop of ready-on-device buffers.

The reference's pipeline is torch ``DataLoader`` workers + a blocking
``.to(device)`` per batch inside the train loop
(reference examples/run_allcnnc_cifar100_deepobs.py:55-60); this is the
TPU-native equivalent of worker prefetch + pinned-memory ``non_blocking``
transfers.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax


def _is_shutdown_unblock(e: BaseException) -> bool:
    """True for exceptions that are the EXPECTED way a blocked source read
    gets unblocked by shutdown: the ``PrefetchLoader`` -1 sentinel
    (``RuntimeError("PrefetchLoader is shutting down")``,
    loader.py::next_batch), a closed generator, or an exhausted iterator.
    Anything else racing ``close()`` is a real source error."""
    if isinstance(e, (GeneratorExit, StopIteration)):
        return True
    return isinstance(e, RuntimeError) and "shutting down" in str(e)


class DevicePrefetcher:
    """Iterator adaptor: batches arrive already resident on device.

    Args:
        source: iterator yielding pytrees of host arrays (e.g. a
            ``PrefetchLoader``, or any generator of ``(inputs, targets)``).
        depth: number of batches transferred ahead (queue bound).  2 is
            enough to hide the transfer behind any step that outlasts it.
        sharding: optional ``jax.sharding.Sharding`` (or pytree of them,
            tree-prefix semantics like ``jax.device_put``) applied during
            the background transfer -- e.g. a batch-axis ``NamedSharding``
            so data-parallel shards are laid out off the critical path.
        n_batches: stop after this many batches (``None`` = run until the
            source is exhausted or :meth:`close` is called).  Useful for
            epoch-bounded loops over the endless ``PrefetchLoader`` stream.
        close_source: if True, :meth:`close` also calls ``source.close()``
            (ownership transfer) -- so e.g. a ``PrefetchLoader``'s native
            threads and mmap handles are released with the prefetcher
            instead of lingering until GC.
    """

    _SENTINEL = object()

    def __init__(
        self,
        source: Iterator[Any],
        depth: int = 2,
        sharding: Optional[Any] = None,
        n_batches: Optional[int] = None,
        close_source: bool = False,
    ):
        if depth < 1:
            raise ValueError(f"Invalid depth {depth}")
        self._source = source
        self._close_source = close_source
        self._sharding = sharding
        self._n_batches = n_batches
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._err_tb = None  # traceback at capture time (re-raise anchor)
        self._done = False  # sentinel consumed -> StopIteration forever
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that aborts promptly on close()."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        count = 0
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                if self._sharding is not None:
                    dev = jax.device_put(batch, self._sharding)
                else:
                    dev = jax.device_put(batch)
                if not self._put(dev):
                    return
                count += 1
                if self._n_batches is not None and count >= self._n_batches:
                    break
        except BaseException as e:  # surfaced on the consumer side
            if self._stop.is_set() and _is_shutdown_unblock(e):
                # close() raced the read: a source unblocked by shutdown
                # (PrefetchLoader.stop() turning hfb_next into the -1
                # sentinel, or a generator closed under us) is a clean
                # stop, not a sticky stream error.  A GENUINE source error
                # (corrupt data, I/O failure) that merely coincides with
                # close() is still recorded so post-mortems see it via
                # ``.error`` -- silently reclassifying it as clean shutdown
                # would hide real failures.
                return
            self._err = e
            self._err_tb = e.__traceback__
        finally:
            self._put(self._SENTINEL)

    def _raise_err(self):
        """Re-raise the sticky source error.  The traceback is reset to the
        one captured in the worker on EVERY raise -- re-raising a shared
        exception instance otherwise appends the consumer's frames to its
        ``__traceback__`` on each poll, growing it without bound."""
        raise self._err.with_traceback(self._err_tb)

    def __iter__(self):
        return self

    def __next__(self):
        # Already-transferred batches are delivered BEFORE any source error
        # is surfaced (the error arrives in stream order, at the point the
        # source actually failed).  A source error is sticky: EVERY
        # subsequent __next__ re-raises it (and it stays readable via
        # :attr:`error`), so a failed stream can never be mistaken for a
        # cleanly exhausted one.
        if self._done:
            if self._err is not None:
                self._raise_err()
            raise StopIteration
        while True:
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set():
                    # close() raced the worker: surface a stored source
                    # error NOW (never after a StopIteration was already
                    # raised -- the failure must not look like clean
                    # exhaustion even transiently).
                    self._done = True
                    if self._err is not None:
                        self._raise_err()
                    raise StopIteration
                continue
            if item is self._SENTINEL:
                self._done = True
                if self._err is not None:
                    self._raise_err()
                raise StopIteration
            return item

    @property
    def error(self) -> Optional[BaseException]:
        """The source exception, if the background stream failed (also
        re-raised by every ``__next__`` after it surfaces).  Check after
        :meth:`close` to distinguish a failed stream from an exhausted one
        when the consumer stopped early."""
        return self._err

    def close(self):
        """Stop the background thread and release queued buffers (and the
        source too, with ``close_source=True``)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        if self._close_source:
            # Unblock a worker parked inside the source's blocking read
            # BEFORE joining: PrefetchLoader.stop() (native hfb_stop) wakes
            # a thread blocked in hfb_next with the -1 sentinel while
            # keeping the handle valid, so the join below succeeds promptly
            # and the destroy afterwards frees nothing still in use.
            stop = getattr(self._source, "stop", None)
            if callable(stop):
                try:
                    stop()
                except Exception:
                    pass
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)
        if self._close_source:
            if self._thread.is_alive():
                # No stop() hook (or it didn't help) and the worker is
                # still inside the source.  Freeing native handles under a
                # blocked reader would be a use-after-free; leave the
                # source to its own __del__/GC path instead.
                import warnings

                warnings.warn(
                    "DevicePrefetcher.close(): worker thread did not stop "
                    "within 5s; skipping source.close() to avoid freeing "
                    "native handles still in use",
                    RuntimeWarning,
                    stacklevel=2,
                )
            else:
                close = getattr(self._source, "close", None)
                if close is not None:
                    close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
