"""Checkpoint/resume for batch transcodes (absent in the reference; SURVEY
section 5 calls for segment-level resume).

Two levels:
  * file-level: an existing, validator-passing output is skipped
  * segment-level: during encode, completed samples are checkpointed to a
    `<output>.part` sidecar every flush interval; a restarted convert picks
    up from the last checkpoint instead of re-encoding from frame 0

The sidecar is keyed by a config fingerprint (source mtime/size, dimensions,
qp, tile grid, bit depth) so stale checkpoints are discarded.
"""
from __future__ import annotations

import hashlib
import logging
import pickle
from pathlib import Path

log = logging.getLogger(__name__)

_MAGIC = b"HTPU-PART-1"


def config_fingerprint(src_path, cfg, n_frames: int) -> str:
    src = Path(src_path)
    st = src.stat()
    key = (str(src.resolve()), st.st_size, int(st.st_mtime), cfg.width,
           cfg.height, cfg.qp, cfg.bit_depth, cfg.tile_cols, cfg.tile_rows,
           n_frames)
    return hashlib.sha256(repr(key).encode()).hexdigest()[:24]


def sidecar_path(out_path) -> Path:
    return Path(str(out_path) + ".part")


def save_checkpoint(out_path, fingerprint: str, samples: list[bytes]) -> None:
    sc = sidecar_path(out_path)
    tmp = sc.with_suffix(".part.tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        pickle.dump({"fp": fingerprint, "samples": samples}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(sc)


def load_checkpoint(out_path, fingerprint: str) -> list[bytes] | None:
    sc = sidecar_path(out_path)
    if not sc.exists():
        return None
    try:
        with open(sc, "rb") as f:
            if f.read(len(_MAGIC)) != _MAGIC:
                return None
            data = pickle.load(f)
        if data.get("fp") != fingerprint:
            log.info("discarding stale checkpoint %s", sc)
            return None
        return data["samples"]
    except Exception as e:
        log.warning("unreadable checkpoint %s: %s", sc, e)
        return None


def clear_checkpoint(out_path) -> None:
    sidecar_path(out_path).unlink(missing_ok=True)


def output_is_complete(out_path, expect_hdr: bool = False) -> bool:
    """File-level resume check: output exists and passes validation."""
    p = Path(out_path)
    if not p.exists() or p.stat().st_size == 0:
        return False
    try:
        from hevc_tpu.validate.validator import validate_mp4
        ok, _ = validate_mp4(p, expect_hdr=expect_hdr, deep=False)
        return ok
    except Exception:
        return False
