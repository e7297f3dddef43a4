#!/usr/bin/env python
"""Model-free dataset probe on raw windowed pixels, per eval tree.

Control arm for the round-5 signature-strength experiment (VERDICT r4 #3):
before interpreting the EMBEDDING probe at strength s, establish whether the
dataset signal is present in the DATA at s — a series-split logistic probe on
handcrafted window-invariant structural features (the same feature family
tests/test_synthetic.py uses to validate v2 separability). If the data-side
probe is high while the embedding probe is low, the embedding lost signal
the data carries (crowding-out); if the data-side probe is itself low, the
embedding probe is ceiling-limited by the generator, not the training.

    python scripts/round5_data_probe.py \
        --trees data/synth_v2_eval_sig033 data/synth_v2_eval_big \
                data/synth_v2_eval_sig200 \
        --out docs/round5/data_probe.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def features(img01: np.ndarray) -> np.ndarray:
    """Window-invariant structural features (tests/test_synthetic.py twin)."""
    x = (img01 - img01.mean()) / (img01.std() + 1e-6)
    gx = np.diff(x, axis=0)
    gy = np.diff(x, axis=1)
    grad = float(np.mean(np.abs(gx)) + np.mean(np.abs(gy)))
    hf = float(np.std(gx))
    speck = float(np.percentile(x, 99.7) - np.percentile(x, 75.0))
    F = np.abs(np.fft.fftshift(np.fft.fft2(x)))
    h, w = F.shape
    ky, kx = np.meshgrid(np.arange(h) - h // 2, np.arange(w) - w // 2,
                         indexing="ij")
    kr = np.hypot(ky, kx)
    band = (kr >= 13 * h / 128) & (kr <= 23 * h / 128)
    band_peak = float(F[band].max() / (F[band].mean() + 1e-6))
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    r = np.hypot(yy, xx)
    ann = (r > 0.78) & (r < 0.95)
    inner = (r > 0.4) & (r < 0.65)
    ring = float(x[ann].mean() - x[inner].mean())
    return np.asarray([grad, hf, speck, band_peak, ring], np.float32)


def probe_tree(tree: Path, max_per_series: int = 6) -> dict:
    from sklearn.linear_model import LogisticRegression

    from dinox_tpu.data.hu import decode_hu16, window
    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.data.pipeline import _read_png_u16

    rows = load_index_rows(tree / "index.csv")
    manifest = json.loads((tree / "split_manifest.json").read_text())
    val_series = set(manifest["val"]["series_dir"])
    by_series: dict[str, list] = {}
    for r in rows:
        if r.series_dir in val_series:
            by_series.setdefault(r.series_dir, []).append(r)

    feats, labels, groups = [], [], []
    names = sorted({r.dataset for r in rows})
    for sd, srows in sorted(by_series.items()):
        for r in srows[:max_per_series]:
            hu = decode_hu16(_read_png_u16(r.png_path))
            feats.append(features(window(hu, 40.0, 400.0)))
            labels.append(names.index(r.dataset))
            groups.append(sd)
    feats = np.stack(feats)
    labels = np.asarray(labels)
    groups = np.asarray(groups)

    # series-split 80/20 (same discipline as the embedding probe)
    uniq = np.unique(groups)
    rng = np.random.default_rng(0)
    rng.shuffle(uniq)
    test_groups = set(uniq[: max(1, len(uniq) // 5)].tolist())
    te = np.isin(groups, list(test_groups))
    mu, sd_ = feats[~te].mean(0), feats[~te].std(0) + 1e-6
    clf = LogisticRegression(max_iter=3000, random_state=0)
    clf.fit((feats[~te] - mu) / sd_, labels[~te])
    acc = float(np.mean(clf.predict((feats[te] - mu) / sd_) == labels[te]))
    return {"tree": str(tree), "n_slices": int(len(labels)),
            "n_test_series": len(test_groups), "data_probe_accuracy": round(acc, 4),
            "chance": round(1.0 / len(names), 4)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trees", nargs="+", type=Path, required=True)
    p.add_argument("--max-per-series", type=int, default=6)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)
    results = [probe_tree(t, args.max_per_series) for t in args.trees]
    payload = {"results": results}
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
