"""Provenance-layer tests (analog of reference tests/test_zoo_manifest.py and
registry/lineage coverage; see SURVEY.md §4)."""

import json
from collections import Counter

import pytest

from dinox_tpu.zoo import (
    DataManifest,
    DatasetMerger,
    DatasetRegistry,
    SliceMetadata,
    compute_catalog_hash,
    load_lineage,
    record_lineage,
    temperature_weights,
)


def make_records(dataset, n_series=2, n_slices=5, spacing=0.7):
    out = []
    for s in range(n_series):
        for z in range(n_slices):
            out.append(
                SliceMetadata(
                    dataset=dataset,
                    series_id=f"{dataset}-series-{s}",
                    slice_idx=z,
                    pixel_spacing_x=spacing + 0.01 * s,
                    pixel_spacing_y=spacing + 0.01 * s,
                    slice_thickness=1.0 + s,
                    image_path=f"{dataset}/{s}/{z}.png",
                    organs_present=["lung"] if dataset == "a" else ["pancreas"],
                )
            )
    return out


# -- registry ---------------------------------------------------------------


def test_bundled_registry_loads_seven_ct_datasets():
    reg = DatasetRegistry.bundled()
    assert len(reg) == 7
    assert "lidc-idri" in reg
    lidc = reg.get("lidc-idri")
    assert lidc.total_slices == 243990
    assert lidc.preprocessing.hu_shift == 32768 and lidc.preprocessing.scale == 10


def test_registry_query_filters():
    reg = DatasetRegistry.bundled()
    assert {e.name for e in reg.query(modality="ct")} == set(reg.names)
    lung = reg.query(organs=["lung"])
    assert {e.name for e in lung} == {"lidc-idri", "mayo-ldct"}
    cc = reg.query(license_prefix="CC-BY-SA")
    assert all(e.license.startswith("CC-BY-SA") for e in cc) and len(cc) == 4


def test_registry_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        DatasetRegistry(tmp_path / "nope")


# -- manifest ---------------------------------------------------------------


def test_manifest_parquet_roundtrip(tmp_path):
    m = DataManifest(make_records("a") + make_records("b"))
    p = tmp_path / "m.parquet"
    m.save(p)
    m2 = DataManifest.load(p)
    assert len(m2) == len(m)
    assert m2.records[0] == m.records[0]
    assert m2.datasets() == ["a", "b"]


def test_empty_manifest_roundtrip(tmp_path):
    p = tmp_path / "empty.parquet"
    DataManifest().save(p)
    m = DataManifest.load(p)
    assert len(m) == 0 and m.spacing_stats().pixel_spacing_x_mean == 0.0


def test_manifest_filter():
    m = DataManifest(make_records("a") + make_records("b"))
    assert len(m.filter(dataset="a")) == 10
    assert len(m.filter(organs=["pancreas"])) == 10
    assert len(m.filter(dataset="a", organs=["pancreas"])) == 0


def test_manifest_sampling_deterministic():
    m = DataManifest(make_records("a", n_series=10, n_slices=10))
    s1 = m.sample(17, seed=7)
    s2 = m.sample(17, seed=7)
    assert [r.image_path for r in s1.records] == [r.image_path for r in s2.records]
    assert len(m.sample(9999)) == 100


def test_spacing_stratified_sampling_covers_bins():
    recs = []
    for i in range(100):
        r = make_records("a", n_series=1, n_slices=1, spacing=0.3 + 0.012 * i)[0]
        recs.append(r.model_copy(update={"image_path": f"p{i}.png"}))
    m = DataManifest(recs)
    s = m.sample(20, strategy="spacing-stratified", seed=3)
    assert len(s) == 20
    sx = [r.pixel_spacing_x for r in s.records]
    # Should cover the low and high spacing regions, not just one cluster.
    assert min(sx) < 0.5 and max(sx) > 1.2


def test_sample_unknown_strategy():
    with pytest.raises(ValueError):
        DataManifest(make_records("a")).sample(3, strategy="bogus")


# -- merge ------------------------------------------------------------------


def test_temperature_weights_properties():
    w = temperature_weights([200_000, 50_000, 10_000], temperature=2.0)
    assert abs(sum(w) - 1.0) < 1e-9
    assert w[0] > w[1] > w[2]
    # T→∞ approaches uniform
    w_inf = temperature_weights([200_000, 50_000, 10_000], temperature=1e9)
    assert max(w_inf) - min(w_inf) < 1e-3
    # T=1 proportional
    w1 = temperature_weights([100, 300], temperature=1.0)
    assert abs(w1[0] - 0.25) < 1e-9
    with pytest.raises(ValueError):
        temperature_weights([10, 0])
    with pytest.raises(ValueError):
        temperature_weights([10], temperature=0)


def test_merge_exact_total_and_shuffle():
    merger = DatasetMerger()
    merger.add(DataManifest(make_records("a", n_series=20, n_slices=10)))
    merger.add(DataManifest(make_records("b", n_series=5, n_slices=10)))
    merged, usage = merger.build(seed=1, total_slices=137, strategy="temperature")
    assert len(merged) == 137
    assert sum(u.slices_used for u in usage) == 137
    assert abs(sum(u.weight for u in usage) - 1.0) < 1e-9
    # both datasets present and interleaved (shuffled)
    ds_seq = [r.dataset for r in merged.records]
    assert set(ds_seq) == {"a", "b"}
    assert ds_seq != sorted(ds_seq)


def test_merge_oversample_includes_every_slice():
    small = DataManifest(make_records("tiny", n_series=1, n_slices=4))
    merger = DatasetMerger()
    merger.add(small, weight=1.0)
    merged, usage = merger.build(seed=0, total_slices=11)
    assert len(merged) == 11
    counts = Counter(r.image_path for r in merged.records)
    assert set(counts) == {r.image_path for r in small.records}  # every slice ≥ once
    assert min(counts.values()) >= 2  # 11 // 4 = 2 full passes


def test_merge_manual_weights():
    merger = DatasetMerger()
    merger.add(DataManifest(make_records("a", n_series=50, n_slices=10)), weight=3.0)
    merger.add(DataManifest(make_records("b", n_series=50, n_slices=10)), weight=1.0)
    merged, usage = merger.build(seed=0, total_slices=100, strategy="manual")
    by_name = {u.name: u for u in usage}
    assert by_name["a"].slices_used == 75 and by_name["b"].slices_used == 25


def test_merge_many_tiny_datasets_exact_total():
    """The min-1 quota floors can overshoot total_slices with many
    small-weight datasets; the allocator must claw the excess back while
    keeping every dataset represented (>= 1)."""
    merger = DatasetMerger()
    merger.add(DataManifest(make_records("big", n_series=100, n_slices=10)), weight=100.0)
    for i in range(6):
        merger.add(DataManifest(make_records(f"tiny{i}", n_series=1, n_slices=3)),
                   weight=0.001)
    merged, usage = merger.build(seed=0, total_slices=10, strategy="manual")
    assert len(merged) == 10
    assert sum(u.slices_used for u in usage) == 10
    # every dataset still represented at least once; excess clawed from the big one
    assert all(u.slices_used >= 1 for u in usage)


def test_merge_errors():
    with pytest.raises(ValueError):
        DatasetMerger().build()
    m = DatasetMerger()
    with pytest.raises(ValueError):
        m.add(DataManifest(), weight=-1)


# -- lineage ----------------------------------------------------------------


def test_lineage_roundtrip(tmp_path):
    merger = DatasetMerger()
    merger.add(DataManifest(make_records("a")))
    merged, usage = merger.build(seed=0, total_slices=8)
    out = tmp_path / "lineage.json"
    lin = record_lineage(
        model_name="dinox-test",
        architecture="vit-tiny",
        modality="ct",
        datasets=usage,
        spacing_stats=merged.spacing_stats(),
        scale_aware=True,
        training_config={"lr": 1e-4},
        random_seed=7,
        output_path=out,
    )
    assert out.exists()
    loaded = load_lineage(out)
    assert loaded.model_name == "dinox-test"
    assert loaded.total_slices == 8
    assert loaded.scale_aware and loaded.random_seed == 7
    assert abs(loaded.total_weight() - 1.0) < 1e-9
    assert json.loads(out.read_text())["architecture"] == "vit-tiny"
    assert lin.training_code_commit != ""


def test_catalog_hash_stability(tmp_path):
    (tmp_path / "x.yaml").write_text("name: x\n")
    h1 = compute_catalog_hash(tmp_path)
    h2 = compute_catalog_hash(tmp_path)
    assert h1 == h2 and len(h1) == 16
    (tmp_path / "x.yaml").write_text("name: y\n")
    assert compute_catalog_hash(tmp_path) != h1
    assert compute_catalog_hash(tmp_path / "missing") == "unknown"


def test_merge_total_below_dataset_count():
    """total_slices < number of datasets: the min-1 floors themselves
    overshoot, so smallest-weight datasets drop to 0 and the budget holds."""
    merger = DatasetMerger()
    for i, w in enumerate([10.0, 5.0, 2.0, 1.0, 0.5, 0.1]):
        merger.add(DataManifest(make_records(f"ds{i}", n_series=1, n_slices=4)),
                   weight=w)
    merged, usage = merger.build(seed=0, total_slices=3, strategy="manual")
    assert len(merged) == 3
    assert sum(u.slices_used for u in usage) == 3
    # the largest-weight datasets keep their slot
    used = {u.name: u.slices_used for u in usage}
    assert used["ds0"] >= 1
