"""Host->device batch prefetch: overlap the H2D transfer with device compute.

The host loader yields numpy batches; the training loop needs them
device-resident. Transferring inline serializes [transfer | step | transfer
| step ...]; this wrapper moves the ``device_put`` / global-batch assembly
onto a daemon thread with a small bounded queue, so the next batch streams to
the device while the current step executes — the TPU-native analog of the
reference DataLoader's ``pin_memory`` + async ``.to(device)`` overlap
(reference scripts/phase5_big_run.py:1711-1713). On PCIe-attached production
hosts this hides H2D entirely; over the dev tunnel it overlaps what the
~27 MB/s link allows.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from dinox_tpu.data.pipeline import Batch


class DevicePrefetcher:
    """Wrap a host batch iterator; yield device-resident Batches.

    depth bounds device memory: at most ``depth`` staged batches live on
    device beyond the one in use. With a mesh, batches are placed as global
    batch-sharded arrays (multi-host safe: every process runs the same
    assembly order on its own thread).
    """

    def __init__(self, batches, mesh=None, depth: int = 2):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._src, self._mesh, self._depth = batches, mesh, depth

    def _place(self, b: Batch) -> Batch:
        import jax

        px, sp = np.asarray(b.pixels), np.asarray(b.spacing)
        if px.ndim == 4:  # lift (B, ...) -> (1, B, ...)
            px, sp = px[None], sp[None]
        if self._mesh is not None:
            from dinox_tpu.parallel.mesh import put_global_batch

            px, sp = put_global_batch(self._mesh, (px, sp))
        else:
            px, sp = jax.device_put((px, sp))
        return Batch(pixels=px, spacing=sp, indices=b.indices)

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        stop = threading.Event()
        self._stop = stop
        _END = object()

        def producer() -> None:
            try:
                for b in self._src:
                    if stop.is_set():
                        return
                    item = self._place(b)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                q.put(_END)
            except BaseException as e:  # noqa: BLE001 — repropagate in consumer
                if not stop.is_set():
                    q.put(e)

        t = threading.Thread(target=producer, daemon=True,
                             name="dinox-device-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def close(self) -> None:
        if hasattr(self, "_stop"):
            self._stop.set()
