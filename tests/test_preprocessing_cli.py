"""Preprocessing CLI smoke tests (subprocess-level, synthetic substrates)."""

import csv
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
PRE = REPO / "scripts" / "preprocessing"


def run(script, *args):
    proc = subprocess.run(
        [sys.executable, str(script), *map(str, args)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, f"{script.name} failed:\n{proc.stderr[-2000:]}"
    return proc.stdout


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    run(PRE / "make_synthetic_data.py", "--out", out, "--series-per-dataset", "2",
        "--slices-per-series", "6", "--size", "48")
    return out


def test_validate_samples(synth, tmp_path):
    out = run(PRE / "validate_samples.py", "--index", synth / "index.csv",
              "--out", tmp_path / "qa", "--n", "6")
    assert "0 bad" in out
    report = json.loads((tmp_path / "qa" / "qa_report.json").read_text())
    assert len(report) == 6 and all(r["ok"] for r in report)


def test_write_dataset_manifest(synth, tmp_path):
    pq = tmp_path / "m.parquet"
    run(PRE / "write_dataset_manifest.py", "--index", synth / "index.csv",
        "--dataset", "synth", "--out", pq, "--organs", "lung")
    from dinox_tpu.zoo.manifest import DataManifest

    m = DataManifest.load(pq)
    assert len(m) == 24 and m.records[0].organs_present == ["lung"]


def test_make_split_manifest_cli(synth, tmp_path):
    out = tmp_path / "split.json"
    run(PRE / "make_split_manifest.py", "--index", synth / "index.csv",
        "--out", out, "--val-fraction", "0.25")
    man = json.loads(out.read_text())
    assert len(man["val"]["series_dir"]) == 1


def test_combine_indices_cli(synth, tmp_path):
    out = tmp_path / "combined.csv"
    run(PRE / "combine_indices.py", f"s1={synth / 'index.csv'}",
        f"s2={synth / 'index.csv'}", "--out", out,
        "--max-series-per-dataset", "1")
    from dinox_tpu.data.index import load_index_rows

    rows = load_index_rows(out)
    assert {r.dataset for r in rows} == {"s1", "s2"}
    assert len({r.series_dir for r in rows if r.dataset == "s1"}) == 1


def test_extract_lidc_malignancy(synth, tmp_path):
    from dinox_tpu.data.index import load_index_rows

    rows = load_index_rows(synth / "index.csv")
    annos = tmp_path / "nodules.csv"
    with open(annos, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["series_dir", "slice_index", "center_x", "center_y",
                    "malignancy", "patient_id"])
        rng = np.random.default_rng(0)
        for i, r in enumerate(rows[:12]):
            w.writerow([r.series_dir, r.slice_index, 24, 24,
                        int(rng.choice([1, 2, 3, 4, 5])), f"pat{i % 4}"])
    out = tmp_path / "mal"
    run(PRE / "extract_lidc_malignancy.py", "--index", synth / "index.csv",
        "--annotations", annos, "--annotations-format", "consensus",
        "--out", out, "--crop", "32")
    for split in ("train", "val", "test"):
        assert (out / f"{split}.csv").exists()
    # patient stratification: splits share no patients -> verified by construction;
    # check crops exist and are the right size
    import PIL.Image

    crops = list((out / "crops").glob("*.png"))
    assert crops
    assert PIL.Image.open(crops[0]).size == (32, 32)


def test_extract_lidc_malignancy_raw_consensus(synth, tmp_path):
    """Raw per-annotator marks -> clustering + multi-rater consensus through
    the CLI (the pylidc-equivalent path on a synthetic fixture)."""
    from dinox_tpu.data.index import load_index_rows

    rows = load_index_rows(synth / "index.csv")
    annos = tmp_path / "marks.csv"
    with open(annos, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["series_dir", "patient_id", "annotator", "slice_index",
                    "center_x", "center_y", "malignancy", "width", "height"])
        # 3 raters marking one nodule per series, ratings straddle threshold
        for si, r in enumerate(rows[:6]):
            for rater, mal in (("r1", 5), ("r2", 4), ("r3", 4 if si % 2 else 1)):
                w.writerow([r.series_dir, f"pat{si % 3}", rater, r.slice_index,
                            24 + hash(rater) % 3, 24, mal, 10, 10])
    out = tmp_path / "mal_raw"
    run(PRE / "extract_lidc_malignancy.py", "--index", synth / "index.csv",
        "--annotations", annos, "--annotations-format", "raw",
        "--out", out, "--crop", "24", "--min-raters", "2")
    all_rows = list(csv.DictReader(open(out / "all.csv")))
    assert all_rows
    assert {"avg_malignancy", "n_raters", "rater_agreement"} <= set(all_rows[0])
    assert all(int(r["n_raters"]) >= 2 for r in all_rows)


def test_temperature_resample_cli(tmp_path):
    # imbalanced 3-dataset index: T=2.0 quotas follow sqrt(n) weights,
    # oversampling the small dataset and subsampling the large one
    src = tmp_path / "combined.csv"
    fieldnames = ["png_path", "series_dir", "slice_index", "encoding",
                  "spacing_x", "spacing_y", "spacing_z", "dataset"]
    with open(src, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for ds, n in (("big", 100), ("small", 10), ("mid", 30)):
            for i in range(n):
                w.writerow(dict(png_path=f"{ds}/{i}.png", series_dir=f"{ds}/s{i % 5}",
                                slice_index=i, encoding="hu16", spacing_x=0.7,
                                spacing_y=0.7, spacing_z=1.5, dataset=ds))
    out = tmp_path / "resampled.csv"
    run(PRE / "temperature_resample.py", "--index", src, "--out", out,
        "--temperature", "2.0", "--seed", "7")

    from collections import Counter

    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.zoo.merge import _allocate_quotas, temperature_weights

    rows = load_index_rows(out)
    assert len(rows) == 140
    got = Counter(r.dataset for r in rows)
    expect = dict(zip(["big", "mid", "small"],
                      _allocate_quotas(140, temperature_weights([100, 30, 10]))))
    assert got == expect
    assert got["small"] > 10 and got["big"] < 100  # over/sub-sampled
    # oversampled rows still point at real slices
    assert all(r.png_path.startswith(r.dataset) for r in rows)
