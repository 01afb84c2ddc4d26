"""CSV result ledger (reference schema: file,status,quality,retries,method,hdr)."""
from __future__ import annotations

import csv
from pathlib import Path

from hevc_tpu.config import CSV_FIELDS, LOG_FILE


def save_csv(results: list[dict], out_dir=".", filename: str = LOG_FILE) -> Path:
    """Rewrite the whole ledger (reference gui/mainwindow.py:347-355)."""
    path = Path(out_dir) / filename
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_FIELDS, extrasaction="ignore")
        w.writeheader()
        for r in results:
            w.writerow(r)
    return path
