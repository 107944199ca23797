"""Profiling / tracing.

TPU-native replacement for the reference's cProfile wrapper
(reference: madrigal/chemcpa/chemCPA/profiling.py:10-64) and manual
batch-time meters: `trace()` wraps a region in a jax.profiler trace
(viewable in TensorBoard / Perfetto), `StepTimer` gives wall-clock step
stats with proper device synchronization.
"""
from __future__ import annotations

import contextlib
import time
import jax


@contextlib.contextmanager
def trace(log_dir: str, with_perfetto: bool = False):
    """jax.profiler trace context: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def _force_completion(result) -> None:
    """Synchronize by reading one scalar of each array leaf back to the
    host (not block_until_ready: see class docstring above)."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(result):
        if not hasattr(leaf, "shape"):
            continue
        if getattr(leaf, "size", 1) == 0:
            continue  # zero-size leaves have nothing to read
        flat = leaf.reshape(-1) if getattr(leaf, "ndim", 0) else leaf
        float(np.asarray(flat[0] if getattr(leaf, "ndim", 0) else flat))


class StepTimer:
    """Wall-clock step timing ended by a device->host read (async dispatch
    makes naive timing meaningless, and on the axon backend
    block_until_ready can return before execution finishes -- CLAUDE.md;
    a small scalar read is the only reliable completion barrier)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            _force_completion(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> dict:
        import numpy as np

        arr = np.asarray(self.times)
        if not len(arr):
            return {}
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "n": len(arr),
        }


def memory_stats() -> dict:
    """Per-device memory stats (the reference sprinkles
    torch.cuda.memory_allocated prints; train_ddi_batch.py:357-360)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out
