"""Batch scheduler: directory-level parallel transcode (reference C14/C15).

batch_convert mirrors the CLI monolith (reference apple_hevc_batch.py:861-882):
rglob over the input-extension set -> worker pool -> per-file convert_video ->
CSV ledger.  Admission control preserves the reference's HDR-aware caps and
reinterprets thermal throttling for this framework's host+device reality
(psutil temps when present, plus host-memory headroom).
"""
from __future__ import annotations

import logging
import threading
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path

from hevc_tpu import config
from hevc_tpu.batch.csvlog import save_csv
from hevc_tpu.batch.transcode import convert_video
from hevc_tpu.io.probe import probe_media

log = logging.getLogger(__name__)


def dynamic_workers() -> int:
    """Thermal-aware worker count (reference apple_hevc_batch.py:837-858)."""
    import os
    cpu = os.cpu_count() or 4
    try:
        import psutil
        temps = psutil.sensors_temperatures()
        vals = [t.current for k in ("coretemp", "acpitz")
                for t in temps.get(k, [])]
        if vals:
            avg = sum(vals) / len(vals)
            if avg > config.TEMP_HARD_C:
                return max(1, cpu // 4)
            if avg > config.TEMP_SOFT_C:
                return max(1, cpu // 2)
    except Exception:
        pass
    return min(4, cpu)


def find_inputs(input_dir) -> list[Path]:
    input_dir = Path(input_dir)
    files = [p for p in sorted(input_dir.rglob("*"))
             if p.is_file() and p.suffix.lower() in config.INPUT_EXTS]
    return files


def pick_worker_count(files: list[Path], requested: int | None = None) -> int:
    """Sample up to 6 files for HDR; cap accordingly (reference :907-914)."""
    if requested:
        return max(1, requested)
    any_hdr = False
    for p in files[:6]:
        try:
            if probe_media(p).is_hdr:
                any_hdr = True
                break
        except Exception:
            pass
    if any_hdr:
        return min(dynamic_workers(), config.CLI_MAX_WORKERS_HDR)
    import os
    return min(os.cpu_count() or 4, config.CLI_MAX_WORKERS_SDR)


def batch_convert(input_dir, output_dir, max_workers: int | None = None,
                  progress_callback=None, stop_event: threading.Event | None = None,
                  csv_dir=None, **kwargs) -> list[dict]:
    """Convert every supported file under input_dir. Returns result dicts
    and writes the CSV ledger (reference batch_convert parity)."""
    files = find_inputs(input_dir)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if not files:
        log.warning("no input files found under %s", input_dir)
        save_csv([], csv_dir or out)
        return []
    workers = pick_worker_count(files, max_workers)
    log.info("batch: %d files, %d workers", len(files), workers)
    results: list[dict] = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futs = {pool.submit(convert_video, f, out,
                            progress_callback=progress_callback,
                            stop_event=stop_event, **kwargs): f
                for f in files}
        for fut in as_completed(futs):
            f = futs[fut]
            try:
                results.append(fut.result())
            except Exception as e:     # never stall the batch (worker.py:43-52)
                log.error("worker crashed on %s: %s", f, e)
                results.append({"file": f.name, "status": "FAILED",
                                "quality": "", "retries": 0, "method": "",
                                "hdr": False})
    save_csv(results, csv_dir or out)
    return results
