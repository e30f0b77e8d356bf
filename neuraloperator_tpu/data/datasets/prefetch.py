"""Prefetching input pipeline: overlap host collation and H2D transfer
with device compute.

The reference relies on torch's native DataLoader (C++ worker pool +
pinned-memory H2D) for this; the TPU-native equivalent overlaps three
stages per step:

1. a background thread collates the NEXT batch on the host (numpy),
2. the same thread issues the device transfer (``jax.device_put`` is
   asynchronous — the copy engine runs while the chip computes),
3. the training step consumes the ALREADY-resident previous batch.

With ``depth=2`` (double buffering) the input pipeline disappears from
the step critical path unless data loading itself is slower than the
step. Optionally places batches on a mesh with batch-dim sharding.
"""

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


class PrefetchLoader:
    """Wrap any dict-batch iterable with background prefetch + device put.

    Drop-in for ``DataLoader`` in the Trainer: iterating yields batches
    that are already device-resident.
    """

    _END = object()

    def __init__(self, loader: Iterable, depth: int = 2, mesh=None,
                 device=None):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.loader = loader
        self.depth = depth
        self.mesh = mesh
        self.device = device

    def __len__(self) -> int:
        return len(self.loader)

    def _place(self, batch: dict) -> dict:
        if self.mesh is not None:
            from ...parallel.mesh import shard_batch

            return shard_batch(batch, self.mesh)
        if self.device is not None:
            return {k: jax.device_put(v, self.device) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for batch in self.loader:
                    # device_put is async: the H2D copy overlaps the
                    # consumer's compute on the previous batch
                    q.put(self._place(dict(batch)))
            except BaseException as e:  # surface in the consumer thread
                err.append(e)
            finally:
                q.put(self._END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._END:
                break
            yield item
        t.join()
        if err:
            raise err[0]
