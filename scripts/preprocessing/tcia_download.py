#!/usr/bin/env python
"""TCIA/NBIA REST downloader (analog of reference
scripts/preprocessing/phase2_tcia_download.py): list a collection's series,
fetch per-series ZIPs, extract DICOMs. Uses only the stdlib (urllib); in a
network-less environment every command fails fast with a clear message.

    python scripts/preprocessing/tcia_download.py list --collection LIDC-IDRI
    python scripts/preprocessing/tcia_download.py fetch --collection LIDC-IDRI \\
        --out /data/raw/lidc [--max-series 10]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

NBIA = "https://services.cancerimagingarchive.net/nbia-api/services/v1"


def _get(endpoint: str, **params) -> bytes:
    url = f"{NBIA}/{endpoint}?{urllib.parse.urlencode(params)}"
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            return r.read()
    except (urllib.error.URLError, OSError) as e:
        raise SystemExit(f"TCIA request failed ({url}): {e} — is network access available?")


def list_series(collection: str) -> list[dict]:
    raw = _get("getSeries", Collection=collection, format="json")
    return json.loads(raw)


def fetch_series(series_uid: str, out_dir: Path) -> int:
    raw = _get("getImage", SeriesInstanceUID=series_uid)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        for name in zf.namelist():
            if name.lower().endswith(".dcm"):
                (out_dir / Path(name).name).write_bytes(zf.read(name))
                n += 1
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pl = sub.add_parser("list")
    pl.add_argument("--collection", required=True)
    pf = sub.add_parser("fetch")
    pf.add_argument("--collection", required=True)
    pf.add_argument("--out", type=Path, required=True)
    pf.add_argument("--max-series", type=int, default=None)
    pf.add_argument("--modality", default="CT")
    args = p.parse_args(argv)

    if args.cmd == "list":
        series = list_series(args.collection)
        for s in series:
            print(f"{s.get('SeriesInstanceUID')} modality={s.get('Modality')} "
                  f"images={s.get('ImageCount')}")
        print(f"total={len(series)}", flush=True)
        return 0

    series = [s for s in list_series(args.collection) if s.get("Modality") == args.modality]
    if args.max_series:
        series = series[: args.max_series]
    for i, s in enumerate(series):
        uid = s["SeriesInstanceUID"]
        target = args.out / uid.replace(".", "_")
        if target.exists() and any(target.iterdir()):
            print(f"[{i + 1}/{len(series)}] {uid}: exists, skipping", flush=True)
            continue
        n = fetch_series(uid, target)
        print(f"[{i + 1}/{len(series)}] {uid}: {n} DICOMs", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
