"""Statistical tests of the 6-metric module on constructed embeddings
(the reference's approach, tests/test_evaluate_panorgan.py per SURVEY.md §4)."""

from dataclasses import dataclass

import numpy as np
import pytest

from dinox_tpu.evaluation import metrics as M


@dataclass
class FakeRow:
    series_dir: str
    dataset: str
    spacing_x: float = 1.0


def make_rows(n_datasets=2, series_per_ds=10, slices_per_series=8):
    rows = []
    for d in range(n_datasets):
        for s in range(series_per_ds):
            for _ in range(slices_per_series):
                rows.append(FakeRow(series_dir=f"ds{d}/s{s}", dataset=f"ds{d}"))
    return rows


def l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def clustered_embeddings(rows, dim=32, sep=5.0, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    names = sorted({r.dataset for r in rows})
    centers = {d: rng.normal(size=dim) * sep for d in names}
    return l2n(np.stack([centers[r.dataset] + rng.normal(size=dim) * noise for r in rows]))


def random_embeddings(rows, dim=32, seed=1):
    return l2n(np.random.default_rng(seed).normal(size=(len(rows), dim)))


# -- view retrieval ---------------------------------------------------------


def test_view_retrieval_perfect_and_random():
    rng = np.random.default_rng(0)
    q = l2n(rng.normal(size=(64, 16)))
    perfect = M.view_retrieval(q, q.copy())
    assert perfect["top1"] == 1.0 and perfect["ratio_vs_random"] == 64.0
    rand = M.view_retrieval(q, l2n(rng.normal(size=(64, 16))))
    assert rand["top1"] < 0.2
    assert perfect["top5"] == 1.0


# -- probe ------------------------------------------------------------------


def test_probe_separates_clustered_not_random():
    rows = make_rows()
    good = M.dataset_discrimination_probe(clustered_embeddings(rows), rows)
    assert good["accuracy"] > 0.95 and good["auc"] > 0.95
    bad = M.dataset_discrimination_probe(random_embeddings(rows), rows)
    assert bad["accuracy"] < 0.8
    lo, hi = good["accuracy_ci95"]
    assert lo <= good["accuracy"] <= hi or good["accuracy"] >= lo


def test_knn_probe_sees_nonlinear_structure_linear_probe_misses():
    """Antipodal clusters: class A lives at ±e0, class B at ±e1. Both class
    means are ~0 so no hyperplane separates them, but cosine-kNN is perfect.
    This is the v2-50K signature (linear probe degrades while kNN holds =>
    information present, not linearly separable)."""
    rng = np.random.default_rng(3)
    rows, embs = [], []
    for d in range(2):
        for s in range(12):
            sign = 1.0 if s % 2 == 0 else -1.0
            for _ in range(8):
                e = rng.normal(size=32) * 0.05
                e[d] += sign * 3.0
                rows.append(FakeRow(series_dir=f"ds{d}/s{s}", dataset=f"ds{d}"))
                embs.append(e)
    out = M.dataset_discrimination_probe(l2n(np.stack(embs)), rows)
    assert out["knn_accuracy"] > 0.95
    assert out["accuracy"] < 0.75  # linear probe can't split antipodal pairs


def test_probe_split_has_no_series_leakage():
    rows = make_rows()
    train_idx, test_idx = M.series_level_split(rows)
    train_series = {rows[i].series_dir for i in train_idx}
    test_series = {rows[i].series_dir for i in test_idx}
    assert not train_series & test_series
    assert len(train_idx) + len(test_idx) == len(rows)


def test_probe_single_dataset_errors():
    rows = make_rows(n_datasets=1)
    out = M.dataset_discrimination_probe(random_embeddings(rows), rows)
    assert "error" in out


# -- counterfactual ---------------------------------------------------------


def test_counterfactual_summary_golden():
    a = l2n(np.asarray([[1.0, 0.0], [0.0, 1.0]]))
    b = l2n(np.asarray([[0.0, 1.0], [0.0, 1.0]]))  # dist 1, 0
    out = M.spacing_counterfactual_from_embeddings(a, b, a)
    assert out["cosine_distance_real_vs_2x"]["mean"] == pytest.approx(0.5)
    assert out["cosine_distance_real_vs_half"]["mean"] == pytest.approx(0.0)


# -- domain clustering ------------------------------------------------------


def test_domain_clustering_enrichment():
    rows = make_rows()
    strong = M.domain_clustering(clustered_embeddings(rows), rows, k=10)
    assert strong["overall_same_dataset_rate"] > 0.95
    assert strong["enrichment_vs_random"] > 1.5
    weak = M.domain_clustering(random_embeddings(rows), rows, k=10)
    assert 0.6 < weak["enrichment_vs_random"] < 1.4


# -- spacing prediction -----------------------------------------------------


def test_spacing_prediction_r2():
    rows = make_rows()
    rng = np.random.default_rng(2)
    spacings = np.stack(
        [np.asarray([0.4 + 2.0 * rng.random(), 1.0, 1.0]) for _ in rows]
    )
    # embeddings that linearly encode log-spacing in one coordinate
    emb = rng.normal(size=(len(rows), 16)) * 0.05
    emb[:, 0] = np.log(spacings[:, 0])
    good = M.spacing_prediction(emb, spacings, rows)
    assert good["r2"] > 0.9
    bad = M.spacing_prediction(rng.normal(size=(len(rows), 16)), spacings, rows)
    assert bad["r2"] < 0.3


# -- embedding stats --------------------------------------------------------


def test_embedding_stats_structure():
    rows = make_rows()
    rng = np.random.default_rng(3)
    spacings = np.abs(rng.normal(size=(len(rows), 3))) + 0.5
    out = M.embedding_stats(clustered_embeddings(rows), spacings, rows)
    assert set(out["per_dataset"]) == {"ds0", "ds1"}
    assert "ds0_vs_ds1" in out["cross_dataset_centroid_cosine"]
    ds0 = out["per_dataset"]["ds0"]
    assert ds0["n"] == 80 and 0 < ds0["intra_cosine_to_centroid"] <= 1.0
