"""Async host->device prefetch — keeps the TPU fed while the host loads bytes.

The reference leans on torch DataLoader workers (CTCLIPTrainer.py:244-257).
Here a small thread pool runs the (pure-Python, GIL-releasing numpy/IO) batch
assembly ahead of consumption and `jax.device_put` stages the next batch into
HBM while the current step runs — double-buffering so the device never waits
on the host (SURVEY.md §7 step 6 duty-cycle goal)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a host batch iterator; overlap loading and device transfer.

    depth: number of batches staged ahead (2 = classic double buffer)."""

    def __init__(
        self,
        source: Iterator,
        sharding=None,
        depth: int = 2,
        name: str = "prefetch",
        process_local: bool = False,
    ):
        """process_local=True: the source yields THIS process's rows only
        (e.g. batches off a `datasets.ProcessShard`); batches are assembled
        into global arrays via jax.make_array_from_process_local_data (the
        global shape is inferred from `sharding`) instead of device_put —
        the multi-host data path, no cross-host batch movement."""
        if process_local and sharding is None:
            raise ValueError("process_local prefetch requires a sharding")
        self._source = source
        self._sharding = sharding
        self._process_local = process_local
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, name=name, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._source:
                if self._process_local:
                    from ctpa.core.mesh import global_batch_from_local

                    batch = global_batch_from_local(self._sharding.mesh, batch)
                elif self._sharding is not None:
                    batch = jax.tree.map(
                        lambda x: jax.device_put(x, self._sharding), batch
                    )
                else:
                    batch = jax.tree.map(jax.device_put, batch)
                self._q.put(batch)
        except BaseException as e:  # propagate loader failures loudly
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
