"""Encoder presets — the reference's select_nvenc_preset analogue
(reference core/transcoder.py:77-92: p4..p7 by resolution x HDR matrix).

Here a preset selects search depth / toolset of the TPU encode graph; the
retry ladder degrades along the same axis (the NVENC feature-degradation
semantics, SURVEY C6).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Preset:
    name: str
    nxn: bool              # PART_NxN 8x8 sub-partition search
    batch_frames: int = 8
    inter: bool = True     # GOP with motion-compensated P frames
    sao: bool = False      # sample-adaptive offset (GOP path)
    bframes: bool = False  # IbPbP GOP (non-reference B pictures)
    ctb32: bool = False    # 32/16 two-level coding quadtree (IPPP)
    sdh: bool = True       # sign-data hiding (x265-medium `signhide`)
    weightp: bool = True   # explicit weighted P prediction (x265-medium
                           # `weightp`)
    bframes_n: int = 1     # non-ref B pictures per mini-GOP (2 = IbbP,
                           # the multi-B step toward x265's bframes 4)


PRESETS = {
    # p4..p7: the reference's NVENC quality ladder (select_nvenc_preset,
    # reference core/transcoder.py:77-92) re-expressed as encoder
    # toolsets — higher p = more RD tools, not a GPU clock:
    #   p4  no NxN intra, single-B mini-GOPs, no SAO        (fastest)
    #   p5  multi-B (IbbP) + weightp + SDH                  (= fast)
    #   p6  + NxN intra in I pictures, SAO in the chunk scan (= medium,
    #       the x265-medium toolset analogue)
    #   p7  + smaller batches for tighter rate control       (= slow-mt)
    # RDOQ-lite is deliberately OFF at every tier: measured +3% bytes,
    # -0.3 dB on the bench content (r3) — the lambda model needs work.
    "p4": Preset("p4", nxn=False, batch_frames=16, bframes=True,
                 bframes_n=1),
    "p5": Preset("p5", nxn=False, batch_frames=16, bframes=True,
                 bframes_n=2),
    "p6": Preset("p6", nxn=True, batch_frames=8, bframes=True,
                 sao=True, bframes_n=2),
    "p7": Preset("p7", nxn=True, batch_frames=4, bframes=True,
                 sao=True, bframes_n=2),
    # ctb32: the 32/16 quadtree encoder (x265's large-CU analogue) with
    # the full production toolset (SAO + SDH + weightp + IbbP mini-GOPs)
    "ctb32": Preset("ctb32", nxn=False, batch_frames=8, ctb32=True,
                    bframes=True, sao=True, bframes_n=2),
    # legacy per-frame pipeline with SAO (pre-chunked slow path)
    "slow": Preset("slow", nxn=True, batch_frames=4, sao=True),
}
# x265-ish aliases kept for the CLI and tests
PRESETS["fast"] = PRESETS["p5"]
PRESETS["medium"] = PRESETS["p6"]


def select_preset(width: int, height: int, is_hdr: bool) -> Preset:
    """The reference's resolution x HDR preset matrix, verbatim
    (select_nvenc_preset, core/transcoder.py:77-92): bigger/HDR content
    gets the higher-quality tier."""
    res = max(width, height)
    if is_hdr:
        name = "p7" if res >= 3840 else ("p6" if res >= 2560 else "p5")
    else:
        name = "p6" if res >= 3840 else ("p5" if res >= 2560 else "p4")
    return PRESETS[name]


def degrade(preset: Preset, step: int) -> Preset:
    """Retry-ladder degradation: lower batch, then drop NxN, then inter."""
    if step == 0:
        return preset
    if step == 1:
        # first retry drops B pictures (the reference's bf=3 -> bf=0 step,
        # core/transcoder.py:94-99)
        return Preset(preset.name + "-d1", preset.nxn,
                      max(preset.batch_frames // 2, 1), preset.inter,
                      preset.sao, bframes=False, sdh=preset.sdh,
                      weightp=preset.weightp)
    return Preset(preset.name + f"-d{step}", False,
                  max(preset.batch_frames >> step, 1), inter=step < 3,
                  sao=False, sdh=preset.sdh, weightp=preset.weightp)
