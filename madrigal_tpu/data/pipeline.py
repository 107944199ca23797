"""Host -> device input pipeline.

The reference's DataLoader-with-workers role (reference: madrigal/
parse_args.py:109 num_workers; collators run on CPU) becomes a
double-buffered prefetch pipeline: a background thread runs the (numpy)
collator for batch t+1 while the device computes batch t, and
`jax.device_put` overlaps the transfer (BASELINE.json: "host-side
featurization streams into a double-buffered device pipeline").
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host-batch iterator; yields device-resident batches with one
    batch of lookahead per buffer slot."""

    def __init__(self, host_iter: Iterable, buffer_size: int = 2,
                 sharding=None):
        self._iter = iter(host_iter)
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._sharding = sharding
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._iter:
                if self._sharding is not None:
                    batch = jax.device_put(batch, self._sharding)
                else:
                    batch = jax.device_put(batch)
                self._q.put(batch)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_epochs(
    make_batch: Callable[[int], object],
    num_steps: int,
    buffer_size: int = 2,
    sharding=None,
) -> Iterator:
    """Prefetch `make_batch(step)` results for step in range(num_steps)."""

    def gen():
        for step in range(num_steps):
            yield make_batch(step)

    return iter(DevicePrefetcher(gen(), buffer_size, sharding))
