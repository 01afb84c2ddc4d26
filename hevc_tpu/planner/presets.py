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
                           # `weightp`; ctb32 path: not yet wired)
    bframes_n: int = 1     # non-ref B pictures per mini-GOP (2 = IbbP,
                           # the multi-B step toward x265's bframes 4)


PRESETS = {
    "fast": Preset("fast", nxn=False, batch_frames=16, bframes=True,
                   bframes_n=2),
    # medium matches x265-medium's always-on SAO (reference delegate
    # core/transcoder.py:398-412); SAO runs inside the chunk scan,
    # non-reference B slices code SAO-off
    "medium": Preset("medium", nxn=True, batch_frames=8, bframes=True,
                     sao=True, bframes_n=2),
    "slow": Preset("slow", nxn=True, batch_frames=4, sao=True),
    # ctb32: the 32/16 quadtree encoder (x265's large-CU analogue), IbPbP
    "ctb32": Preset("ctb32", nxn=False, batch_frames=8, ctb32=True,
                    bframes=True, weightp=False),
}


def select_preset(width: int, height: int, is_hdr: bool) -> Preset:
    """Resolution x HDR matrix (the reference biased presets by the same
    two inputs).  Bigger frames lean faster; HDR biases one step faster."""
    if height >= 2160:
        name = "fast"
    elif height >= 1080:
        name = "fast" if is_hdr else "medium"
    else:
        name = "medium" if is_hdr else "slow"
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
