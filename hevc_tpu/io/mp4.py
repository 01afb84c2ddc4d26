"""MP4 (ISO BMFF) muxer emitting the Apple-compatible atom set.

Replaces the reference's ffmpeg muxing flags (reference core/transcoder.py:
466, 490-492): `hvc1` sample entry (not hev1), `colr` nclx atom, `mdcv`/`clli`
HDR10 static metadata boxes, brand `mp42`, faststart layout (moov before
mdat), handler names, tv color range.  Output is always .mp4 and never
overwrites the input (enforced by the batch layer).
"""
from __future__ import annotations

import struct
from fractions import Fraction

from hevc_tpu.entropy.headers import PRIMARIES, TRANSFERS, MATRICES
from hevc_tpu.planner.hdr import parse_master_display


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def _hvcc(vps: bytes, sps: bytes, pps: bytes, cfg) -> bytes:
    """HEVCDecoderConfigurationRecord (ISO 14496-15 8.3.3.1)."""
    out = bytearray()
    out += bytes([1])                                   # configurationVersion
    profile_space = 0
    tier = 1 if cfg.tier_high else 0
    out += bytes([(profile_space << 6) | (tier << 5) | cfg.profile_idc])
    compat = (1 << (31 - 1)) | (1 << (31 - 2))          # main + main10
    out += struct.pack(">I", compat)
    # constraint flags: progressive, non_packed, frame_only (match SPS PTL)
    out += bytes([0b10110000, 0, 0, 0, 0, 0])
    out += bytes([cfg.level_idc])
    out += struct.pack(">H", 0xF000)                    # min_spatial_seg
    out += bytes([0xFC])                                # parallelismType 0
    out += bytes([0xFC | 1])                            # chromaFormat 4:2:0
    out += bytes([0xF8 | (cfg.bit_depth - 8)])
    out += bytes([0xF8 | (cfg.bit_depth - 8)])
    out += struct.pack(">H", 0)                         # avgFrameRate
    out += bytes([(0 << 6) | (1 << 3) | (1 << 2) | 3])  # 1 layer, nested, len=4
    out += bytes([3])                                   # numOfArrays
    for nal_type, nal in ((32, vps), (33, sps), (34, pps)):
        out += bytes([0x80 | nal_type])                 # array_completeness=1
        out += struct.pack(">H", 1)
        out += struct.pack(">H", len(nal)) + nal
    return bytes(out)


def _colr(cfg) -> bytes:
    p = PRIMARIES.get(cfg.color_primaries, 2)
    t = TRANSFERS.get(cfg.color_transfer, 2)
    m = MATRICES.get(cfg.color_space, 2)
    fr = 0x80 if getattr(cfg, "full_range", False) else 0
    return _box(b"colr", b"nclx" + struct.pack(">HHHB", p, t, m, fr))


def _hdr_boxes(master_display: str | None, max_cll: str | None) -> bytes:
    out = b""
    md = parse_master_display(master_display) if master_display else None
    if md:
        out += _box(b"mdcv", struct.pack(
            ">HHHHHHHHII",
            md["g"][0], md["g"][1], md["b"][0], md["b"][1],
            md["r"][0], md["r"][1], md["wp"][0], md["wp"][1],
            md["max_lum"], md["min_lum"]))
    if max_cll:
        try:
            cll, fall = (int(x) for x in max_cll.split(","))
            out += _box(b"clli", struct.pack(">HH", cll, fall))
        except ValueError:
            pass
    return out


_AAC_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350]


def _esds(rate: int, channels: int, bitrate: int) -> bytes:
    sri = _AAC_RATES.index(rate) if rate in _AAC_RATES else 3
    asc = struct.pack(">H", (2 << 11) | (sri << 7) | (channels << 3))

    def desc(tag: int, payload: bytes) -> bytes:
        return bytes([tag, len(payload)]) + payload

    dsi = desc(0x05, asc)
    dcd = desc(0x04, bytes([0x40, 0x15]) + b"\x00\x00\x00" +
               struct.pack(">II", bitrate, bitrate) + dsi)
    es = desc(0x03, struct.pack(">HB", 1, 0) + dcd + desc(0x06, b"\x02"))
    return _full(b"esds", 0, 0, es)


def _audio_trak(audio: dict, chunk_offset: int) -> bytes:
    pkts = audio["packets"]
    rate = audio["rate"]
    ch = audio["channels"]
    n = len(pkts)
    duration = n * 1024
    se = bytearray()
    se += b"\x00" * 6 + struct.pack(">H", 1)
    se += b"\x00" * 8                                    # version/rev/vendor
    se += struct.pack(">HH", ch, 16)                     # channels, samplesize
    se += struct.pack(">HH", 0, 0)
    se += struct.pack(">I", rate << 16)
    se += _esds(rate, ch, audio.get("bitrate", 128000))
    mp4a = _box(b"mp4a", bytes(se))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + mp4a)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1024))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
                 b"".join(struct.pack(">I", len(p)) for p in pkts))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    minf = _box(b"minf", smhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun" +
                 b"\x00" * 12 + b"Core Media Audio\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, rate, duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(
        ">IIIIIIIHHHHIIIIIIIIIII",
        0, 0, 2, 0, duration, 0, 0, 0, 0, 0x0100, 0,
        0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000, 0, 0))
    return _box(b"trak", tkhd + mdia)


def mux_mp4(path, samples: list[bytes], cfg, fps: Fraction | None = None,
            vps: bytes | None = None, sps: bytes | None = None,
            pps: bytes | None = None, sync_samples: list[int] | None = None,
            hdr_metadata: dict | None = None, audio: dict | None = None,
            composition_offsets: list[int] | None = None) -> None:
    """Write an .mp4 with one HEVC video track (+ optional AAC audio track).

    samples: per-frame bitstream payloads IN DECODE ORDER, each a
    concatenation of length-prefixed NAL units (utils.bitio.length_prefixed).
    cfg: StreamConfig (dimensions, level, color description, bit depth).
    audio: {"packets": [bytes], "rate": int, "channels": int, "bitrate": int}.
    composition_offsets: per-sample (display_idx - decode_idx) in FRAMES for
    reordered (B-frame) streams; a ctts box (version 0, unsigned) is written
    with a constant +1-frame shift so offsets stay non-negative.
    """
    fps = fps or cfg.fps
    timescale = fps.numerator
    sample_delta = fps.denominator
    n = len(samples)
    duration = n * sample_delta

    video_bytes = b"".join(samples)
    audio_bytes = b"".join(audio["packets"]) if audio else b""
    mdat_payload = video_bytes + audio_bytes

    # --- stbl ---
    hvc1_extra = _hvcc(vps, sps, pps, cfg)
    hdrm = hdr_metadata or {}
    # hvc1 visual sample entry (ISO 14496-12 12.1.3 + 14496-15 8.4.1)
    se = bytearray()
    se += b"\x00" * 6 + struct.pack(">H", 1)            # reserved + dref idx
    se += struct.pack(">HH", 0, 0)                      # pre_defined, reserved
    se += struct.pack(">III", 0, 0, 0)                  # pre_defined[3]
    se += struct.pack(">HH", cfg.width, cfg.height)
    se += struct.pack(">II", 0x00480000, 0x00480000)    # h/v resolution
    se += struct.pack(">I", 0)                          # reserved
    se += struct.pack(">H", 1)                          # frame_count
    se += bytes([0]) + b"\x00" * 31                     # compressorname
    se += struct.pack(">Hh", 24, -1)                    # depth, pre_defined
    se += _box(b"hvcC", hvc1_extra)
    se += _colr(cfg)
    se += _hdr_boxes(hdrm.get("master_display"), hdrm.get("max_cll"))
    hvc1 = _box(b"hvc1", bytes(se))

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + hvc1)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
                 b"".join(struct.pack(">I", len(s)) for s in samples))
    if sync_samples is None:
        sync_samples = list(range(1, n + 1))            # all-intra
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(sync_samples)) +
                 b"".join(struct.pack(">I", i) for i in sync_samples))
    ctts = b""
    if composition_offsets is not None:
        shift = max(0, -min(composition_offsets))       # keep v0 unsigned
        entries = [(o + shift) * sample_delta for o in composition_offsets]
        ctts = _full(b"ctts", 0, 0, struct.pack(">I", len(entries)) +
                     b"".join(struct.pack(">II", 1, e) for e in entries))

    # stco needs the mdat payload offset: compute moov size iteratively
    def build_moov(chunk_offset: int) -> bytes:
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + ctts + stsc + stsz + stss + stco)
        url = _full(b"url ", 0, 1, b"")
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
        dinf = _box(b"dinf", dref)
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        minf = _box(b"minf", vmhd + dinf + stbl)
        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                     b"\x00" * 12 + b"Core Media Video\x00")
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))  # und language
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(b"tkhd", 0, 3, struct.pack(
            ">IIIIIIIHHHHIIIIIIIIIII",
            0, 0, 1, 0, duration, 0, 0, 0, 0, 0, 0,
            0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
            cfg.width << 16, cfg.height << 16))
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIIII", 0, 0, timescale, duration, 0x00010000) +
            struct.pack(">HHII", 0x0100, 0, 0, 0) +
            struct.pack(">IIIIIIIII", 0x00010000, 0, 0, 0, 0x00010000, 0,
                        0, 0, 0x40000000) +
            struct.pack(">IIIIII", 0, 0, 0, 0, 0, 0) +
            struct.pack(">I", 3 if audio else 2))       # next_track_id
        atrak = b""
        if audio:
            atrak = _audio_trak(audio, chunk_offset + len(video_bytes))
        return _box(b"moov", mvhd + trak + atrak)

    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) +
                b"mp42" + b"isom" + b"hvc1")
    # faststart: ftyp + moov + mdat; iterate since stco depends on moov size
    moov = build_moov(0)
    offset = len(ftyp) + len(moov) + 8
    moov = build_moov(offset)
    offset2 = len(ftyp) + len(moov) + 8
    if offset2 != offset:
        moov = build_moov(offset2)
    with open(path, "wb") as f:
        f.write(ftyp)
        f.write(moov)
        f.write(_box(b"mdat", mdat_payload))
