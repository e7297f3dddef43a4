"""Host-side input pipeline: PNG decode -> fixed-canvas uint16 batches.

TPU-first split of responsibilities (SURVEY.md §7): the host only decodes
16-bit PNGs and assembles 2.5D (z-1, z, z+1) stacks on a fixed-size canvas;
ALL augmentation (deci-HU decode, random windowing, random resized crop,
flip, normalization, two views) runs on-device in a single fused jitted
function (dinox_tpu.ops.augment) — replacing the reference's CPU
DataLoader-worker augmentation (scripts/phase5_big_run.py:471-570).

Robustness parity: a failed sample decode retries up to 10 times with a
random substitute index (reference: scripts/phase5_big_run.py:529-570).
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import CancelledError, ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from dinox_tpu.data.index import IndexRow, SeriesMap
from dinox_tpu.data.sampler import batched, diverse_order, shuffled_order

log = logging.getLogger(__name__)

MAX_RETRIES = 10


def _read_png_u16(path: str) -> np.ndarray:
    """Decode a 16-bit grayscale PNG to a uint16 (H, W) array.

    Uses the native zlib decoder (GIL-released, native/png16.cc) when
    available; falls back to PIL for anything it can't handle."""
    from dinox_tpu.data.png_native import read_png16

    native = read_png16(path)
    if native is not None:
        return native
    from PIL import Image

    with Image.open(path) as img:
        arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr.astype(np.uint16, copy=False)


def _to_canvas(arr: np.ndarray, size: int) -> np.ndarray:
    """Bring a (H, W) uint16 slice to (size, size) — cheap host resize only
    when the native resolution differs (CT is typically already 512x512)."""
    if arr.shape == (size, size):
        return arr
    from PIL import Image

    img = Image.fromarray(arr.astype(np.float32), mode="F")
    out = np.asarray(img.resize((size, size), Image.BILINEAR))
    return np.clip(np.round(out), 0, 65535).astype(np.uint16)


@dataclass
class Batch:
    """One host-assembled batch, pre-augmentation.

    pixels: (B, canvas, canvas, 3) uint16 — channels-last 2.5D stack, raw
            PNG encoding (deci-HU decode happens on device).
    spacing: (B, 3) float32 — (spacing_x, spacing_y, slice_thickness) mm.
    indices: (B,) int64 — global row indices (for deterministic device RNG).
    """

    pixels: np.ndarray
    spacing: np.ndarray
    indices: np.ndarray


class SliceStackSource:
    """Random-access source of canvas-sized 2.5D stacks.

    A bounded LRU cache sits over the decode: every slice is read up to three
    times as the (z-1, z, z+1) context of its neighbors, and small datasets
    are re-read every epoch — caching the decoded canvases removes most of
    that repeated PNG inflate work (the 2.5D analog of the reference's
    reliance on OS page cache + many DataLoader processes)."""

    def __init__(self, rows: list[IndexRow], canvas: int = 512, cache_slices: int = 512,
                 decoded_cache=None):
        if not rows:
            raise ValueError("empty index")
        self.rows = rows
        self.canvas = canvas
        self.series = SeriesMap.build(rows)
        self._cache: "dict[str, np.ndarray]" = {}
        self._cache_lock = threading.Lock()
        self._cache_slices = cache_slices
        # Optional write-once on-disk decoded cache (data/slice_cache.py):
        # a hit is a page-cache memcpy instead of a zlib inflate — the
        # production fix for the 1-core decode ceiling (round-5).
        self._disk_cache = decoded_cache

    def __len__(self) -> int:
        return len(self.rows)

    def _decode(self, path: str) -> np.ndarray:
        if self._disk_cache is not None:
            plane = self._disk_cache.get(path)
            if plane is not None:
                return plane  # memmap view; np.stack copies downstream
        with self._cache_lock:
            cached = self._cache.pop(path, None)
            if cached is not None:
                self._cache[path] = cached  # re-insert as most recent
                return cached
        plane = _to_canvas(_read_png_u16(path), self.canvas)
        with self._cache_lock:
            self._cache[path] = plane
            while len(self._cache) > self._cache_slices:
                self._cache.pop(next(iter(self._cache)))
        return plane

    def _load_one(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        row = self.rows[idx]
        zm1, z0, zp1 = self.series.neighbors(row)
        planes = [self._decode(r.png_path) for r in (zm1, z0, zp1)]
        pixels = np.stack(planes, axis=-1)  # (H, W, 3) channels-last
        spacing = np.asarray([row.spacing_x, row.spacing_y, row.spacing_z], np.float32)
        return pixels, spacing

    def get(self, idx: int, rng: Optional[np.random.Generator] = None) -> tuple[np.ndarray, np.ndarray, int]:
        """Load stack *idx*; on failure retry a random substitute up to
        MAX_RETRIES times. Returns (pixels, spacing, actual_idx)."""
        rng = rng or np.random.default_rng()
        for attempt in range(MAX_RETRIES):
            try:
                pixels, spacing = self._load_one(idx)
                return pixels, spacing, idx
            except Exception as e:  # noqa: BLE001 - substitute-and-retry by design
                log.warning("data load error at %d (%s): %s", idx, self.rows[idx].png_path, e)
                idx = int(rng.integers(0, len(self.rows)))
        raise RuntimeError(f"Failed to load data after {MAX_RETRIES} attempts")


class TrainLoader:
    """Infinite, deterministic, prefetching batch iterator.

    Epoch order is a pure function of (seed, epoch) — identical on every
    host — and each host takes a disjoint strided shard of it, so the global
    batch is a deterministic function of the step (the multi-host analog of
    the reference's seeded single-host shuffle). Position (epoch, batch
    offset) is exposed for checkpointing — a capability the reference lacks
    (acknowledged at scripts/integration_canary.py:192-197).
    """

    def __init__(
        self,
        rows: list[IndexRow],
        batch_size: int,
        *,
        seed: int = 0,
        canvas: int = 512,
        diverse: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        host_id: int = 0,
        num_hosts: int = 1,
        start_epoch: int = 0,
        start_batch: int = 0,
        cache_slices: int = 512,
        decoded_cache=None,
    ):
        self.source = SliceStackSource(rows, canvas, cache_slices=cache_slices,
                                       decoded_cache=decoded_cache)
        self.batch_size = batch_size
        self.seed = seed
        self.diverse = diverse
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.epoch = start_epoch
        self.batch_in_epoch = start_batch
        self._pool = ThreadPoolExecutor(max_workers=num_workers, thread_name_prefix="dinox-data")
        self._prefetch = prefetch

    def _epoch_batches(self, epoch: int) -> list[np.ndarray]:
        rows = self.source.rows
        order = (
            diverse_order(rows, self.seed, epoch)
            if self.diverse
            else shuffled_order(len(rows), self.seed, epoch)
        )
        # Each host takes a CONTIGUOUS block of every global batch: global
        # batch b = order[b*G : (b+1)*G], host h owns rows [h*B, (h+1)*B) of
        # it. put_global_batch places process shards in process order, so the
        # assembled global array equals a single-host run's batch
        # position-for-position — and since per-sample augmentation RNG is
        # keyed by batch position, single- and multi-host runs produce
        # IDENTICAL training streams (testable loss parity, not just
        # statistical equivalence).
        global_bs = self.batch_size * self.num_hosts
        gbatches = batched(order, global_bs, drop_last=True)
        lo = self.host_id * self.batch_size
        return [g[lo:lo + self.batch_size] for g in gbatches]

    def _assemble(self, idxs: np.ndarray, epoch: int) -> Batch:
        # One Generator per slot: np.random.Generator is not thread-safe, and
        # the pool workers would otherwise share one through the retry path.
        # Deterministic per (seed, epoch, row): retry substitutes don't depend
        # on thread scheduling.
        def load(i):
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch, int(i)]))
            return self.source.get(int(i), rng)

        results = list(self._pool.map(load, idxs))
        pixels = np.stack([r[0] for r in results])
        spacing = np.stack([r[1] for r in results])
        actual = np.asarray([r[2] for r in results], np.int64)
        return Batch(pixels=pixels, spacing=spacing, indices=actual)

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue[Batch]" = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()
        self._stop = stop

        def put_or_stop(item: Batch) -> bool:
            # Bounded put that stays responsive to `stop`: a plain q.put()
            # would block forever once the consumer goes away with the
            # queue full, leaking the producer thread and its batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            epoch, offset = self.epoch, self.batch_in_epoch
            try:
                while not stop.is_set():
                    chunks = self._epoch_batches(epoch)
                    for b, idxs in enumerate(chunks):
                        if b < offset:
                            continue
                        if stop.is_set():
                            return
                        if not put_or_stop(self._assemble(idxs, epoch)):
                            return
                    offset = 0
                    epoch += 1
            except (CancelledError, RuntimeError):
                # close() shuts the pool down with cancel_futures=True while
                # an _assemble may be mid-map: the resulting CancelledError
                # (or "cannot schedule new futures after shutdown") is the
                # expected teardown path, not a worker crash. Anything that
                # fires while the loader is still live is a real error.
                if not stop.is_set():
                    raise

        t = threading.Thread(target=producer, daemon=True, name="dinox-producer")
        t.start()
        batches_per_epoch = len(self._epoch_batches(self.epoch))
        try:
            while True:
                item = q.get()
                # Advance the checkpointable position *before* handing the
                # batch out, so `position` reflects the next batch to train.
                self.batch_in_epoch += 1
                if self.batch_in_epoch >= batches_per_epoch:
                    self.epoch += 1
                    self.batch_in_epoch = 0
                yield item
        finally:
            stop.set()

    def close(self) -> None:
        if hasattr(self, "_stop"):
            self._stop.set()
        self._pool.shutdown(wait=False, cancel_futures=True)

    @property
    def position(self) -> tuple[int, int]:
        """(epoch, batch_in_epoch) — checkpointable loader position."""
        return self.epoch, self.batch_in_epoch
