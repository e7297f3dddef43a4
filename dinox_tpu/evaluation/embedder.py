"""Batched embedding of index rows for evaluation.

The deterministic path (fixed window + center crop) feeds metrics 2-6; the
stochastic two-view path feeds view retrieval. Both embed the L2-normalized
backbone CLS token (not the projection head), matching the reference embedder
(scripts/evaluate_panorgan.py:175-221).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.data.index import IndexRow
from dinox_tpu.data.pipeline import SliceStackSource
from dinox_tpu.ops.augment import AugConfig, augment_views, eval_transform
from dinox_tpu.zoo.hub import LoadedModel


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _load_batches(rows: Sequence[IndexRow], idxs: np.ndarray, canvas: int, batch_size: int):
    """Decode eval batches with a thread pool + one-batch prefetch.

    The per-slice PNG decode releases the GIL (native/png16.cc), so the
    pool parallelizes the inflate work within a batch, and assembling batch
    i+1 overlaps the device forward of batch i — the same overlap structure
    as the training TrainLoader (a round-2 ledger item noted this path was
    serial on the host)."""
    src = SliceStackSource(list(rows), canvas=canvas)
    workers = min(8, max(2, os.cpu_count() or 2))

    def assemble(chunk: np.ndarray, pool: ThreadPoolExecutor):
        pixels = np.stack(
            list(pool.map(lambda i: src.get(int(i))[0], chunk.tolist()))
        )
        spacing = np.stack(
            [[rows[i].spacing_x, rows[i].spacing_y, rows[i].spacing_z] for i in chunk],
            dtype=np.float32,
        )
        return pixels, spacing

    chunks = [idxs[s : s + batch_size] for s in range(0, len(idxs), batch_size)]
    # Separate pools: the 1-thread prefetcher runs at most one assemble()
    # while the decode pool fans out its per-slice work — assembles never
    # occupy (and so never starve) the decode workers.
    with ThreadPoolExecutor(max_workers=workers,
                            thread_name_prefix="dinox-eval-decode") as pool, \
         ThreadPoolExecutor(max_workers=1,
                            thread_name_prefix="dinox-eval-prefetch") as prefetcher:
        pending = None
        for chunk in chunks:
            fut = prefetcher.submit(assemble, chunk, pool)
            if pending is not None:
                yield pending.result()
            pending = fut
        if pending is not None:
            yield pending.result()


def embed_rows(
    model: LoadedModel,
    rows: Sequence[IndexRow],
    *,
    batch_size: int = 64,
    canvas: int = 512,
    spacing_scale: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic embeddings: (N, D) L2-normalized CLS + (N, 3) spacings.

    ``spacing_scale`` supports the counterfactual metric (x2 / x0.5 spacing,
    same pixels)."""
    idxs = np.arange(len(rows))
    embs, sps = [], []
    for pixels, spacing in _load_batches(rows, idxs, canvas, batch_size):
        x = eval_transform(jnp.asarray(pixels), img_size=model.img_size)
        sp = jnp.asarray(spacing * spacing_scale) if model.scale_aware else None
        feats = model(x, sp)
        embs.append(np.asarray(feats[:, 0], np.float32))
        sps.append(spacing)
    return _l2n(np.concatenate(embs)), np.concatenate(sps)


def embed_two_views(
    model: LoadedModel,
    rows: Sequence[IndexRow],
    idxs: np.ndarray,
    *,
    seed: int = 42,
    batch_size: int = 64,
    canvas: int = 512,
    aug: Optional[AugConfig] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Two independently-augmented views per row -> (q, k) normalized CLS
    embeddings for view retrieval."""
    aug = aug or AugConfig(img_size=model.img_size)
    key = jax.random.key(seed)
    q_chunks, k_chunks = [], []
    for bi, (pixels, spacing) in enumerate(_load_batches(rows, idxs, canvas, batch_size)):
        views = augment_views(jnp.asarray(pixels), jax.random.fold_in(key, bi), aug)
        sp = jnp.asarray(spacing) if model.scale_aware else None
        q_chunks.append(np.asarray(model(views[0], sp)[:, 0], np.float32))
        k_chunks.append(np.asarray(model(views[1], sp)[:, 0], np.float32))
    return _l2n(np.concatenate(q_chunks)), _l2n(np.concatenate(k_chunks))
