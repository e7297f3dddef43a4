"""Nodule-consensus tests on synthetic annotation fixtures (the analog of the
reference's pylidc-driven benchmark builder; dinox_tpu/data/lidc.py)."""

import numpy as np
import pytest

from dinox_tpu.data.lidc import (
    RawAnnotation,
    build_nodules,
    cluster_annotations,
    consensus_from_cluster,
    stratified_patient_split,
)


def mark(series, annotator, z, x, y, mal, patient=None):
    return RawAnnotation(
        series_dir=series, patient_id=patient or f"pat-{series}",
        annotator=annotator, slice_index=z, center_x=x, center_y=y,
        malignancy=mal, width=10, height=10,
    )


def test_clustering_groups_nearby_marks_and_separates_nodules():
    annos = [
        # nodule A: 3 raters within a few voxels
        mark("s1", "r1", 10, 100, 100, 4),
        mark("s1", "r2", 10, 102, 101, 5),
        mark("s1", "r3", 11, 99, 103, 4),
        # nodule B: far away in-plane
        mark("s1", "r1", 10, 300, 300, 2),
        mark("s1", "r2", 10, 303, 298, 1),
        # other series: same coords as A but must not merge across series
        mark("s2", "r1", 10, 100, 100, 3),
    ]
    clusters = cluster_annotations(annos, spacing=(0.7, 0.7, 1.5), distance_mm=10)
    sizes = sorted(len(c) for c in clusters)
    assert sizes == [1, 2, 3]


def test_clustering_transitive_chain():
    """A-B close, B-C close, A-C farther: connected components keep them one
    nodule (pylidc clustering semantics), not two."""
    annos = [
        mark("s", "r1", 10, 100, 100, 4),
        mark("s", "r2", 10, 108, 100, 4),
        mark("s", "r3", 10, 116, 100, 4),
    ]
    clusters = cluster_annotations(annos, spacing=(1, 1, 1), distance_mm=9)
    assert len(clusters) == 1 and len(clusters[0]) == 3


def test_consensus_mean_std_and_min_raters():
    cluster = [
        mark("s", "r1", 10, 100, 100, 5),
        mark("s", "r2", 10, 104, 100, 3),
        mark("s", "r3", 12, 102, 102, 4),
    ]
    c = consensus_from_cluster(cluster, min_raters=2)
    assert c is not None
    assert c.n_raters == 3
    assert c.avg_malignancy == pytest.approx(4.0)
    assert c.rater_agreement == pytest.approx(float(np.std([5, 3, 4])))
    assert c.slice_index == 11  # round(mean(10,10,12))
    assert c.label(threshold=3.0) == 1
    # union bbox covers every rater's extent
    imin, imax, jmin, jmax = c.bbox
    assert imin <= 95 and imax >= 107 and jmin <= 95 and jmax >= 109
    # single-rater cluster rejected
    assert consensus_from_cluster([cluster[0]], min_raters=2) is None
    # the same rater marking twice is one opinion
    assert consensus_from_cluster([cluster[0], cluster[0]], min_raters=2) is None


def test_build_nodules_end_to_end():
    annos = []
    for z, x, y, mals in [(10, 100, 100, [5, 4, 5]), (40, 200, 220, [1, 2])]:
        for i, m in enumerate(mals):
            annos.append(mark("s", f"r{i}", z, x + i, y - i, m))
    nodules = build_nodules(annos, spacing=(0.7, 0.7, 1.5), min_raters=2)
    assert len(nodules) == 2
    labels = sorted(n.label() for n in nodules)
    assert labels == [0, 1]


def test_stratified_patient_split_no_leakage_and_balance():
    items = []
    rng = np.random.default_rng(0)
    for p in range(20):
        lab = p % 2  # half positive-majority, half negative-majority patients
        for n in range(int(rng.integers(1, 4))):
            items.append({"patient": f"p{p}", "label": lab})
    train, val, test = stratified_patient_split(
        items, patient_of=lambda s: s["patient"], label_of=lambda s: s["label"],
        train_ratio=0.7, val_ratio=0.15, seed=1,
    )
    assert len(train) + len(val) + len(test) == len(items)
    sets = [
        {s["patient"] for s in split} for split in (train, val, test)
    ]
    assert not (sets[0] & sets[1]) and not (sets[0] & sets[2]) and not (sets[1] & sets[2])
    # stratification: both labels present in train, and positives make up
    # roughly half of it (patients are balanced by construction)
    pos_frac = sum(s["label"] for s in train) / len(train)
    assert 0.25 < pos_frac < 0.75


def test_consensus_exactly_three_is_indeterminate():
    """avg malignancy exactly at the threshold is indeterminate — not
    malignant — matching the consensus-CSV path's ==3 drop."""
    cluster = [
        mark("s", "r1", 10, 100, 100, 2),
        mark("s", "r2", 10, 101, 101, 4),
    ]
    c = consensus_from_cluster(cluster, min_raters=2)
    assert c.avg_malignancy == pytest.approx(3.0)
    assert c.is_indeterminate(3.0)
    assert c.label(3.0) == 0  # and never labeled malignant
    assert not consensus_from_cluster(
        [mark("s", "r1", 10, 100, 100, 4), mark("s", "r2", 10, 101, 101, 4)],
        min_raters=2,
    ).is_indeterminate(3.0)
