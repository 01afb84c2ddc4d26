"""Minimal ISO BMFF parser: probe + validator support.

Parses enough box structure to (a) fill VideoInfo for .mp4 inputs, (b) let
the conformance validator check the atom set the muxer promises (hvc1, colr,
mdcv/clli, brand, faststart), and (c) extract parameter sets + samples so our
own decoder can decode our own .mp4 output.
"""
from __future__ import annotations

import struct
from fractions import Fraction
from pathlib import Path


def parse_boxes(data: bytes, offset: int = 0, end: int | None = None):
    """Yield (type, payload_offset, payload_size, box_offset)."""
    end = len(data) if end is None else end
    while offset + 8 <= end:
        size = struct.unpack(">I", data[offset:offset + 4])[0]
        tag = data[offset + 4:offset + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[offset + 8:offset + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - offset
        if size < hdr:
            return
        yield tag, offset + hdr, size - hdr, offset
        offset += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _walk(data, offset, size, path, out):
    for tag, poff, psz, boff in parse_boxes(data, offset, offset + size):
        key = path + "/" + tag.decode("latin1")
        out.setdefault(key, []).append((poff, psz))
        if tag in _CONTAINERS:
            _walk(data, poff, psz, key, out)
        elif tag == b"stsd":
            # skip fullbox header + entry count, then sample entries
            _walk_stsd(data, poff, psz, key, out)


def _walk_stsd(data, poff, psz, key, out):
    n = struct.unpack(">I", data[poff + 4:poff + 8])[0]
    off = poff + 8
    for _ in range(n):
        size = struct.unpack(">I", data[off:off + 4])[0]
        tag = data[off + 4:off + 8]
        k = key + "/" + tag.decode("latin1")
        out.setdefault(k, []).append((off + 8, size - 8))
        if tag in (b"hvc1", b"hev1", b"avc1"):
            # visual sample entry: 78 bytes fixed, then sub-boxes
            _walk(data, off + 8 + 78, size - 8 - 78, k, out)
        off += size


def index_mp4(path) -> tuple[bytes, dict]:
    data = Path(path).read_bytes()
    out: dict[str, list] = {}
    _walk(data, 0, len(data), "", out)
    return data, out


def parse_hvcc(data: bytes, off: int, size: int) -> dict:
    b = data[off:off + size]
    out = {
        "profile_idc": b[1] & 0x1F,
        "tier": (b[1] >> 5) & 1,
        "level_idc": b[12],
        "chroma_format": b[16] & 3,
        "bit_depth": (b[17] & 7) + 8,
        "length_size": (b[21] & 3) + 1,
        "nals": {},
    }
    n_arrays = b[22]
    p = 23
    for _ in range(n_arrays):
        nal_type = b[p] & 0x3F
        cnt = struct.unpack(">H", b[p + 1:p + 3])[0]
        p += 3
        lst = []
        for _ in range(cnt):
            ln = struct.unpack(">H", b[p:p + 2])[0]
            lst.append(b[p + 2:p + 2 + ln])
            p += 2 + ln
        out["nals"][nal_type] = lst
    return out


def probe_mp4(path) -> dict:
    """Structural probe of an .mp4 -> dict of stream facts."""
    data, idx = index_mp4(path)
    info: dict = {"container": "mp4"}
    if "/ftyp" in idx:
        poff, psz = idx["/ftyp"][0]
        info["brand"] = data[poff:poff + 4].decode("latin1")
        info["compatible"] = [data[poff + 8 + i * 4:poff + 12 + i * 4].decode("latin1")
                              for i in range((psz - 8) // 4)]
    for codec in ("hvc1", "hev1", "avc1"):
        k = f"/moov/trak/mdia/minf/stbl/stsd/{codec}"
        if k in idx:
            poff, psz = idx[k][0]
            info["codec"] = "hevc" if codec.startswith("h") and codec != "avc1" else "h264"
            info["sample_entry"] = codec
            info["width"] = struct.unpack(">H", data[poff + 24:poff + 26])[0]
            info["height"] = struct.unpack(">H", data[poff + 26:poff + 28])[0]
            break
    k = "/moov/trak/mdia/minf/stbl/stsd/hvc1/hvcC"
    if k in idx:
        poff, psz = idx[k][0]
        info["hvcc"] = parse_hvcc(data, poff, psz)
    k = "/moov/trak/mdia/minf/stbl/stsd/hvc1/colr"
    if k in idx:
        poff, psz = idx[k][0]
        if data[poff:poff + 4] == b"nclx":
            p, t, m, fr = struct.unpack(">HHHB", data[poff + 4:poff + 11])
            info["colr"] = {"primaries": p, "transfer": t, "matrix": m,
                            "full_range": bool(fr & 0x80)}
    for tag in ("mdcv", "clli"):
        k = f"/moov/trak/mdia/minf/stbl/stsd/hvc1/{tag}"
        if k in idx:
            info[tag] = True
    if "/moov/trak/mdia/mdhd" in idx:
        poff, _ = idx["/moov/trak/mdia/mdhd"][0]
        ver = data[poff]
        if ver == 0:
            ts, dur = struct.unpack(">II", data[poff + 12:poff + 20])
        else:
            ts = struct.unpack(">I", data[poff + 20:poff + 24])[0]
            dur = struct.unpack(">Q", data[poff + 24:poff + 32])[0]
        info["timescale"] = ts
        info["duration"] = dur / ts if ts else 0.0
    if "/moov/trak/mdia/minf/stbl/stts" in idx:
        poff, _ = idx["/moov/trak/mdia/minf/stbl/stts"][0]
        cnt = struct.unpack(">I", data[poff + 4:poff + 8])[0]
        total = 0
        delta0 = 0
        for i in range(cnt):
            c, d = struct.unpack(">II", data[poff + 8 + i * 8:poff + 16 + i * 8])
            total += c
            delta0 = delta0 or d
        info["nb_frames"] = total
        if delta0 and "timescale" in info:
            info["fps"] = Fraction(info["timescale"], delta0)
    if "/moov/trak/mdia/minf/stbl/stss" in idx:
        poff, _ = idx["/moov/trak/mdia/minf/stbl/stss"][0]
        cnt = struct.unpack(">I", data[poff + 4:poff + 8])[0]
        info["sync_samples"] = [
            struct.unpack(">I", data[poff + 8 + 4 * i:poff + 12 + 4 * i])[0]
            for i in range(cnt)]          # 1-based sample numbers
    # faststart check: moov before mdat
    moov_off = idx.get("/moov", [(None, None)])[0][0]
    mdat = [b for b in parse_boxes(data) if b[0] == b"mdat"]
    if moov_off is not None and mdat:
        info["faststart"] = moov_off < mdat[0][1]
    return info


def extract_samples(path) -> tuple[dict, list[bytes]]:
    """Parameter sets + per-sample NAL payloads from our own .mp4 output."""
    data, idx = index_mp4(path)
    info = probe_mp4(path)
    hvcc = info.get("hvcc")
    stbl = "/moov/trak/mdia/minf/stbl"
    poff, _ = idx[stbl + "/stsz"][0]
    n = struct.unpack(">I", data[poff + 8:poff + 12])[0]
    fixed = struct.unpack(">I", data[poff + 4:poff + 8])[0]
    sizes = [fixed] * n if fixed else [
        struct.unpack(">I", data[poff + 12 + 4 * i:poff + 16 + 4 * i])[0]
        for i in range(n)]
    poff, _ = idx[stbl + "/stco"][0]
    nch = struct.unpack(">I", data[poff + 4:poff + 8])[0]
    chunk_offs = [struct.unpack(">I", data[poff + 8 + 4 * i:poff + 12 + 4 * i])[0]
                  for i in range(nch)]
    # v0 muxer: one chunk, contiguous samples
    samples = []
    off = chunk_offs[0]
    for s in sizes:
        samples.append(data[off:off + s])
        off += s
    return info, samples
