"""dinox_tpu/utils/trace_analysis.py: chrome-trace hlo_category aggregation."""

import gzip
import json

from dinox_tpu.utils.trace_analysis import (
    aggregate_by_category,
    find_trace_files,
    format_category_table,
    summarize_trace_dir,
)


def _fake_events():
    return [
        # device ops (carry hlo_category)
        {"ph": "X", "dur": 1000, "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "dur": 500, "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "dur": 250, "args": {"hlo_category": "custom-call"}},
        # host / metadata events (no category) must be ignored
        {"ph": "X", "dur": 9999, "args": {"name": "host thing"}},
        {"ph": "M", "args": {"hlo_category": "custom-call"}},
        {"ph": "X", "dur": 10},
    ]


def test_aggregate_by_category_sums_and_sorts():
    cats = aggregate_by_category(_fake_events(), steps=2)
    assert list(cats) == ["convolution fusion", "custom-call"]
    assert cats["convolution fusion"]["ms"] == 1.5
    assert cats["convolution fusion"]["ms_per_step"] == 0.75
    assert cats["convolution fusion"]["count"] == 2
    assert cats["custom-call"]["ms"] == 0.25


def test_summarize_trace_dir_reads_gz(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_08_18"
    d.mkdir(parents=True)
    doc = {"traceEvents": _fake_events()}
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(doc, f)
    assert len(find_trace_files(tmp_path)) == 1
    summary = summarize_trace_dir(tmp_path, steps=1)
    assert summary["categories"]["convolution fusion"]["ms_per_step"] == 1.5
    table = format_category_table(summary["categories"])
    assert "convolution fusion" in table
