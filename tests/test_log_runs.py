"""Ledger regeneration (scripts/log_runs.py): scrape fidelity, note
preservation via the csv, and idempotent preservation of the hand-written
tail below the manual marker."""

import csv
import importlib.util
import json
from pathlib import Path


def _load():
    path = Path(__file__).resolve().parent.parent / "scripts" / "log_runs.py"
    spec = importlib.util.spec_from_file_location("log_runs_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mk_run(runs, name, steps=3, loss=1.5):
    d = runs / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "model": {"name": "vit-tiny", "scale_aware": True},
        "batch_size": 8, "accumulation_steps": 1, "lr": 1e-4, "max_steps": steps,
    }))
    with open(d / "metrics.jsonl", "w") as f:
        for s in range(1, steps + 1):
            f.write(json.dumps({"step": s, "loss": loss, "samples_per_s": 10.0}) + "\n")


def test_ledger_scrape_notes_and_manual_tail(tmp_path):
    mod = _load()
    runs, out = tmp_path / "runs", tmp_path / "docs"
    _mk_run(runs, "alpha")
    _mk_run(runs, "beta", loss=0.5)

    assert mod.main(["--runs-dir", str(runs), "--out-dir", str(out)]) == 0
    md = (out / "EXPERIMENTS.md").read_text()
    assert "| alpha |" in md and "| beta |" in md
    # header must not contain the literal marker (regen would mis-split)
    head = md.split("\n\n")[0] + md.split("\n\n")[1]
    assert mod.MANUAL_MARK not in md  # no tail yet, and not in the header

    # add a note via the csv + a hand-written tail, then regenerate twice
    rows = list(csv.DictReader(open(out / "experiments.csv")))
    for r in rows:
        if r["run"] == "alpha":
            r["notes"] = "the alpha note"
    with open(out / "experiments.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    (out / "EXPERIMENTS.md").write_text(
        md + "\n" + mod.MANUAL_MARK + "\nHistorical:\n\n| gone | run |\n")

    for _ in range(2):
        assert mod.main(["--runs-dir", str(runs), "--out-dir", str(out)]) == 0
    md2 = (out / "EXPERIMENTS.md").read_text()
    assert "the alpha note" in md2
    assert md2.count(mod.MANUAL_MARK) == 1
    assert "| gone | run |" in md2
    assert md2.index("| alpha |") < md2.index(mod.MANUAL_MARK)

def test_ledger_preserves_rows_for_cleaned_run_dirs(tmp_path):
    """Run dirs are scratch, the ledger is the record: deleting a run dir
    and regenerating must keep the finished run's row (round-4 regression —
    a post-cleanup regen erased all historical rows)."""
    mod = _load()
    runs, out = tmp_path / "runs", tmp_path / "docs"
    _mk_run(runs, "alpha")
    _mk_run(runs, "beta", loss=0.5)
    assert mod.main(["--runs-dir", str(runs), "--out-dir", str(out)]) == 0

    import shutil
    shutil.rmtree(runs / "alpha")
    _mk_run(runs, "gamma", loss=0.1)
    for _ in range(2):  # idempotent
        assert mod.main(["--runs-dir", str(runs), "--out-dir", str(out)]) == 0

    rows = {r["run"]: r for r in csv.DictReader(open(out / "experiments.csv"))}
    assert set(rows) == {"alpha", "beta", "gamma"}
    assert rows["alpha"]["final_loss"] == "1.5"  # scraped values survive
    md = (out / "EXPERIMENTS.md").read_text()
    assert md.index("| alpha |") < md.index("| beta |") < md.index("| gamma |")
