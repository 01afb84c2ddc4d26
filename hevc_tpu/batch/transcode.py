"""convert_video — THE public per-file API (reference core/transcoder.py:537).

Signature, result schema, and control flow preserved:
  probe -> decide encoder path -> encode with retry/degradation ladder ->
  fallback to robust path -> validate -> CSV-ready result dict
  {"file", "status", "quality", "retries", "method", "hdr"}

Reinterpretation of the reference's GPU/CPU split for TPU (SURVEY C6/C11):
  * fast path  = jit-compiled TPU encode graph ("nvenc" analogue)
  * robust path = scalar numpy reference encoder ("cpu/libx265" analogue)
  * the 4-step NVENC degradation ladder becomes search/feature degradation
    presets (v0: batch-size reduction; richer knobs as the encoder grows)
  * validator failure deletes the output and re-encodes on the robust path
    (the monolith's semantics, reference apple_hevc_batch.py:782-791)
"""
from __future__ import annotations

import logging
import threading
import time
from fractions import Fraction
from pathlib import Path

import numpy as np

from hevc_tpu import config
from hevc_tpu.io.probe import probe_media
from hevc_tpu.io.videoinfo import VideoInfo
from hevc_tpu.planner.levels import select_level
from hevc_tpu.planner.rate import calculate_dynamic_values
from hevc_tpu.planner.hdr import build_hdr_metadata

log = logging.getLogger(__name__)

# degradation ladder (NVENC_RETRIES analogue): 4 steps of preset degradation
RETRY_LADDER = [0, 1, 2, 3]


def decide_encoder(force_cpu: bool, force_gpu: bool,
                   nvenc_hdr_mode: str = "auto") -> bool:
    """True -> TPU fast path.  Exact reference precedence (monolith
    decide_encoder, apple_hevc_batch.py:278-285): force_cpu first, then
    nvenc_hdr_mode == 'disable' forces the robust path, then availability."""
    if force_cpu:
        return False
    if nvenc_hdr_mode == "disable":
        return False
    if force_gpu:
        return True
    try:
        import jax
        return len(jax.devices()) > 0
    except Exception:
        return False


def _read_frames(path: Path, info: VideoInfo):
    """Frame iterator for supported inputs."""
    if path.suffix.lower() == ".y4m":
        from hevc_tpu.io.y4m import Y4MReader
        return Y4MReader(path).read_all()
    # decode through the linked libavformat/avcodec ingest (not a subprocess)
    from hevc_tpu.validate import avref
    if avref.available():
        frames = avref.decode_file(str(path))
        if frames:
            return frames
    raise RuntimeError(f"no decodable ingest path for {path}")


def convert_video(file_path, out_dir, progress_callback=None, debug=False,
                  skip_validator=False, force_cpu=False, force_gpu=False,
                  stop_event: threading.Event | None = None,
                  nvenc_hdr_mode: str = "auto", qp_override: int | None = None,
                  resume: bool = False, preset: str | None = None) -> dict:
    """Transcode one file to Apple-compatible HEVC .mp4.

    Returns {"file", "status", "quality", "retries", "method", "hdr"}.
    status in {"SUCCESS", "FAILED", "CANCELLED"}.
    """
    file_path = Path(file_path)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / (file_path.stem + ".mp4")
    if out_path.resolve() == file_path.resolve():
        out_path = out_dir / (file_path.stem + "_hevc.mp4")

    result = {"file": file_path.name, "status": "FAILED", "quality": "",
              "retries": 0, "method": "", "hdr": False}

    info = probe_media(file_path)
    result["hdr"] = info.is_hdr
    if resume:
        from hevc_tpu.batch.resume import output_is_complete
        if output_is_complete(out_path, expect_hdr=info.is_hdr):
            result["status"] = "SUCCESS"
            result["method"] = "resume-skip"
            return result
    plan = calculate_dynamic_values(info)
    level = select_level(info)
    qp = qp_override if qp_override is not None else plan.qp
    result["quality"] = f"crf{plan.crf}" if qp_override is None else f"qp{qp}"
    if debug:
        log.info("plan for %s: %s level=%s tier=%s", file_path.name,
                 plan.as_dict(), level.level, level.tier_high)

    use_fast = decide_encoder(force_cpu, force_gpu, nvenc_hdr_mode)
    from hevc_tpu.planner.presets import select_preset, degrade, PRESETS
    base_preset = (PRESETS[preset] if preset else
                   select_preset(info.width, info.height, info.is_hdr))
    deadline = time.time() + config.ENCODE_TIMEOUT

    def cancelled() -> bool:
        return stop_event is not None and stop_event.is_set()

    try:
        frames = _read_frames(file_path, info)
    except Exception as e:
        log.error("ingest failed for %s: %s", file_path, e)
        return result
    total = len(frames)
    if total == 0:
        return result

    audio = _prepare_audio(file_path)

    attempts = 0
    status = None
    method = None
    digest_map: dict = {}   # display idx -> encoder recon digest
    for ladder_step in (RETRY_LADDER if use_fast else [0]):
        if cancelled():
            status = "CANCELLED"
            break
        attempts = ladder_step + 1
        backend = "jax" if use_fast else "reference"
        pr = degrade(base_preset, ladder_step)
        digest_map.clear()
        try:
            ok = _encode_to_mp4(frames, info, level, qp, out_path,
                                backend=backend,
                                batch_frames=pr.batch_frames,
                                progress_callback=progress_callback,
                                file_name=file_path.name,
                                stop_event=stop_event, deadline=deadline,
                                audio=audio, src_path=file_path, resume=resume,
                                nxn=pr.nxn, sao=pr.sao,
                                bframes=pr.bframes,
                                ctb32=getattr(pr, "ctb32", False),
                                sdh=getattr(pr, "sdh", False),
                                weightp=getattr(pr, "weightp", False),
                                bframes_n=getattr(pr, "bframes_n", 1),
                                rate_plan=plan if qp_override is None else None,
                                gop=plan.gop if pr.inter else 0,
                                out_digests=digest_map)
            if ok == "CANCELLED":
                status = "CANCELLED"
                break
            method = "tpu" if use_fast else "cpu-ref"
            status = "SUCCESS"
            break
        except Exception as e:
            log.warning("encode attempt %d failed (%s): %s", attempts,
                        backend, e)
            if debug:
                log.exception("encode failure detail")
            continue
    else:
        # fast-path ladder exhausted -> robust path (NVENC->CPU analogue)
        if use_fast and status is None and not cancelled():
            try:
                attempts += 1
                ok = _encode_to_mp4(frames, info, level, qp, out_path,
                                    backend="reference", batch_frames=1,
                                    progress_callback=progress_callback,
                                    file_name=file_path.name,
                                    stop_event=stop_event, deadline=deadline,
                                    audio=audio)
                status = "CANCELLED" if ok == "CANCELLED" else "SUCCESS"
                method = "cpu-ref"
            except Exception as e:
                log.error("robust path failed for %s: %s", file_path, e)
                status = "FAILED"

    if status == "SUCCESS" and not skip_validator and not cancelled():
        from hevc_tpu.validate.validator import validate_mp4
        ok, msgs = validate_mp4(out_path, expect_hdr=info.is_hdr,
                                recon_digests=(digest_map
                                               if method == "tpu" else None))
        if not ok:
            log.warning("validator rejected %s: %s; re-encoding on robust "
                        "path", out_path.name, msgs)
            out_path.unlink(missing_ok=True)
            if method != "cpu-ref":
                try:
                    attempts += 1
                    _encode_to_mp4(frames, info, level, qp, out_path,
                                   backend="reference", batch_frames=1,
                                   progress_callback=progress_callback,
                                   file_name=file_path.name,
                                   stop_event=stop_event, deadline=deadline,
                                   audio=audio)
                    ok2, msgs2 = validate_mp4(out_path, expect_hdr=info.is_hdr)
                    if ok2:
                        method = "cpu-ref"
                    else:
                        out_path.unlink(missing_ok=True)
                        status = "FAILED"
                except Exception:
                    status = "FAILED"
            else:
                status = "FAILED"

    if cancelled():
        status = "CANCELLED"

    result["status"] = status or "FAILED"
    result["retries"] = max(0, attempts - 1)
    result["method"] = method or ""
    if progress_callback:    # force 100% (reference transcoder.py:632-636)
        try:
            progress_callback(file_path.name, total, total)
        except Exception:
            pass
    return result


def _encode_to_mp4_ctb32(frames, info, level, qp, out_path,
                         progress_callback, file_name, stop_event, deadline,
                         audio, rate_plan, gop, fps, bit_depth,
                         sdh: bool = False, bframes: bool = False,
                         sao: bool = False, weightp: bool = False,
                         bframes_n: int = 1,
                         out_digests: dict | None = None):
    """ctb32-preset encode: 32/16 quadtree IPPP/IbPbP on the fused device
    path.  With B pictures samples land in decode order and display order
    is restored at mux time via ctts composition offsets."""
    from collections import deque
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import b_schedule
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder, make_ctb32_config
    from hevc_tpu.entropy.headers import write_vps, write_sps, write_pps, \
        write_aud
    from hevc_tpu.io.mp4 import mux_mp4
    from hevc_tpu.utils.bitio import length_prefixed

    h, w = frames[0][0].shape
    nh32 = (h + 31) // 32
    nw32 = (w + 31) // 32
    tc, tr = pick_tile_grid(nh32, nw32, ctb=32)
    cfg = make_ctb32_config(
        width=w, height=h, qp=qp, fps=fps, bit_depth=bit_depth,
        level_idc=level.level_idc, tier_high=level.tier_high,
        profile_idc=2 if level.profile == "main10" else 1,
        color_primaries=info.color_primaries,
        color_transfer=info.color_transfer, color_space=info.color_space,
        full_range=info.color_range == "pc", chromaloc=info.chromaloc,
        hdr=info.is_hdr, tile_cols=tc, tile_rows=tr, inter=True, sdh=sdh,
        bframes=bframes, sao=sao, weightp=weightp, bframes_n=bframes_n)
    rc = None
    if rate_plan is not None:
        from hevc_tpu.encoder.rc import RateController
        rc = RateController(base_qp=qp,
                            target_bps=rate_plan.vbv_maxrate_kbps * 1000
                            * 0.85,
                            vbv_max_bps=rate_plan.vbv_maxrate_kbps * 1000,
                            vbv_buf_bits=rate_plan.vbv_bufsize_kbits * 1000,
                            fps=float(fps))
    enc = Ctb32GopEncoder(cfg)
    samples = []
    total = len(frames)
    pending: deque = deque()

    def drain_one():
        idx, kind, fut = pending.popleft()
        nal = fut.result()
        samples.append(length_prefixed([write_aud(min(kind, 2)), nal]))
        if rc is not None:
            rc.update(len(nal) * 8)
        if progress_callback:
            try:
                progress_callback(file_name, idx + 1, total)
            except Exception:
                pass

    from hevc_tpu.entropy.headers import rps_sets
    sets = rps_sets(cfg)
    sched = b_schedule(total, gop, bframes, bframes_n)
    for i, (disp, kind, poc, rps) in enumerate(sched):
        if stop_event is not None and stop_event.is_set():
            for _, _, fut in pending:
                fut.cancel()
            return "CANCELLED"
        if time.time() > deadline:
            raise TimeoutError("per-file encode timeout")
        cur_qp = rc.qp if rc is not None else cfg.qp
        f = frames[disp]
        planes = (np.asarray(f[0], np.int32), np.asarray(f[1], np.int32),
                  np.asarray(f[2], np.int32))
        if kind == 2:
            neg, pos = sets[rps]
            fut = enc.encode_b_async(*planes,
                                     pocs=(poc, poc - neg[0], poc + pos[0]),
                                     qp=cur_qp, rps_idx=rps)
        else:
            fut = enc.encode_next_async(*planes, idr=kind == 0, qp=cur_qp,
                                        poc=poc, rps_idx=rps)
        pending.append((i, kind, fut))
        while len(pending) > 3:
            drain_one()
    while pending:
        drain_one()
    if out_digests is not None:
        # decode-order digests -> display index (sched e[0]); B rows None
        out_digests.update(
            (sched[j][0], d) for j, d in enumerate(enc.recon_digests)
            if d is not None)
    from hevc_tpu.planner.hdr import build_hdr_metadata
    syncs = [k + 1 for k, e in enumerate(sched) if e[1] == 0]
    comp = [e[0] - k for k, e in enumerate(sched)] if bframes else None
    mux_mp4(out_path, samples, cfg, fps=fps,
            vps=write_vps(cfg), sps=write_sps(cfg), pps=write_pps(cfg),
            sync_samples=syncs, composition_offsets=comp,
            hdr_metadata=build_hdr_metadata(info),
            audio=audio)
    return "SUCCESS"


def _prepare_audio(file_path: Path):
    """Decode source audio and re-encode per the AAC policy (SURVEY C8).

    Returns the muxer's audio dict or None (no audio / harness absent).
    """
    try:
        from hevc_tpu.validate import avref
        from hevc_tpu.planner.audio import plan_audio
        dec = avref.decode_audio(file_path)
        if dec is None:
            return None
        pcm, rate = dec
        plan = plan_audio(pcm.shape[1], rate)
        if rate != plan.sample_rate:
            from hevc_tpu.planner.audio import resample_pcm
            pcm = resample_pcm(pcm, rate, plan.sample_rate)
            rate = plan.sample_rate
        packets = avref.encode_aac(pcm, rate, plan.bitrate)
        if not packets:
            return None
        return {"packets": packets, "rate": rate, "channels": pcm.shape[1],
                "bitrate": plan.bitrate}
    except Exception as e:
        log.warning("audio path failed for %s: %s (continuing video-only)",
                    file_path, e)
        return None


def _encode_to_mp4(frames, info: VideoInfo, level, qp: int, out_path: Path,
                   backend: str, batch_frames: int, progress_callback,
                   file_name: str, stop_event, deadline: float, audio=None,
                   src_path=None, resume: bool = False, nxn: bool = True,
                   rate_plan=None, gop: int = 0, sao: bool = False,
                   bframes: bool = False, ctb32: bool = False,
                   sdh: bool = False, weightp: bool = False,
                   bframes_n: int = 1,
                   out_digests: dict | None = None):
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.toplevel import VideoEncoder, entropy_encode_frame
    from hevc_tpu.io.mp4 import mux_mp4
    from hevc_tpu.utils.bitio import length_prefixed
    from hevc_tpu.entropy.headers import write_vps, write_sps, write_pps, \
        write_aud

    h, w = frames[0][0].shape
    fps = Fraction(info.fps).limit_denominator(1001) if info.fps else Fraction(30)
    tile_cols = tile_rows = 1
    if backend == "jax":
        from hevc_tpu.encoder.frame_jax import pick_tile_grid, CTB
        nh = (h + CTB - 1) // CTB
        nw = (w + CTB - 1) // CTB
        tile_cols, tile_rows = pick_tile_grid(nh, nw)
    bit_depth = 10 if level.profile == "main10" else 8
    if bit_depth == 10 and int(np.asarray(frames[0][0]).max()) <= 255:
        # 8-bit source flagged HDR: requantize code values to 10-bit
        # (the reference's p010le conversion, core/transcoder.py:205-208)
        frames = [tuple(np.asarray(p, np.int32) << 2 for p in f)
                  for f in frames]
    use_inter = gop > 1 and backend == "jax"
    if ctb32 and use_inter:
        return _encode_to_mp4_ctb32(frames, info, level, qp, out_path,
                                    progress_callback, file_name,
                                    stop_event, deadline, audio, rate_plan,
                                    gop, fps, bit_depth, sdh,
                                    bframes=bframes and use_inter, sao=sao,
                                    weightp=weightp, bframes_n=bframes_n,
                                    out_digests=out_digests)
    cfg = StreamConfig(
        width=w, height=h, qp=qp, fps=fps, bit_depth=bit_depth,
        level_idc=level.level_idc, tier_high=level.tier_high,
        profile_idc=2 if level.profile == "main10" else 1,
        color_primaries=info.color_primaries,
        color_transfer=info.color_transfer,
        color_space=info.color_space,
        full_range=info.color_range == "pc",
        chromaloc=info.chromaloc, hdr=info.is_hdr,
        tile_cols=tile_cols, tile_rows=tile_rows,
        inter=use_inter, sao=sao and use_inter,
        bframes=bframes and use_inter,
        sdh=sdh and backend == "jax",
        weightp=weightp and use_inter,
        bframes_n=bframes_n,
    )
    enc = VideoEncoder(cfg, backend=backend)
    rc = None
    if rate_plan is not None:
        from hevc_tpu.encoder.rc import RateController
        rc = RateController(base_qp=qp,
                            target_bps=rate_plan.vbv_maxrate_kbps * 1000 * 0.85,
                            vbv_max_bps=rate_plan.vbv_maxrate_kbps * 1000,
                            vbv_buf_bits=rate_plan.vbv_bufsize_kbits * 1000,
                            fps=float(fps))
    samples = []
    total = len(frames)
    fp = None
    if resume and src_path is not None:
        from hevc_tpu.batch import resume as RZ
        fp = RZ.config_fingerprint(src_path, cfg, total)
        prev = RZ.load_checkpoint(out_path, fp)
        if prev:
            samples = prev[:total]
            log.info("resuming %s from frame %d", file_name, len(samples))
    if use_inter:
        # GOP path: frames are sequential (P depends on the previous
        # picture), tiles stay the device batch.  Resume restarts at the
        # last IDR-aligned checkpoint so the DPB can be rebuilt.
        from hevc_tpu.encoder.gop import GopEncoder
        from hevc_tpu.utils.metrics import EncodeStats
        from collections import deque
        # truncating to a GOP boundary makes the next frame an IDR, which
        # needs no DPB state
        samples = samples[:(len(samples) // gop) * gop]
        i = len(samples)
        last_ckpt = i
        genc = GopEncoder(cfg, enable_nxn=nxn)
        stats = EncodeStats(w, h, float(fps))
        # device/host pipeline: frame N+1's device step is dispatched while
        # frame N's decision fetch + CABAC run on the GopEncoder worker
        # thread.  The rate controller sees frame bits with one frame of lag.
        pending: deque = deque()

        def finish_frame(j, kind_j, nal):
            nonlocal last_ckpt
            samples.append(length_prefixed(
                [write_aud(min(kind_j, 2)), nal]))
            stats.frame_done(len(nal))
            if rc is not None:
                rc.update(len(nal) * 8)
            done = j + 1
            if fp is not None and done - last_ckpt >= 32 and done % gop == 0:
                from hevc_tpu.batch import resume as RZ
                RZ.save_checkpoint(out_path, fp, samples)
                last_ckpt = done
            if progress_callback:
                try:
                    progress_callback(file_name, done, total)
                except Exception:
                    pass

        def drain_one():
            j0, kinds_j, fut = pending.popleft()
            nals = fut.result()
            if isinstance(nals, bytes):       # per-frame (SAO) path
                nals, kinds_j = [nals], [kinds_j]
            for k, nal in enumerate(nals):
                finish_frame(j0 + k, kinds_j[k], nal)

        # chunked GOP-segment path (one device dispatch + 2 packed fetches
        # per chunk; SAO runs inside the chunk scan, B slices code SAO-off).
        # Samples land in DECODE order; with B pictures the display order
        # is restored at mux time via ctts composition offsets.
        chunked = genc.mc
        from hevc_tpu.encoder.gop import b_schedule, chunk_groups
        sched = (b_schedule(total, gop, cfg.bframes, cfg.bframes_n)
                 if chunked else None)
        i0 = i                      # resume offset into sched
        groups = (chunk_groups(sched[i:], cfg.bframes) if chunked
                  else None)
        CH = 8
        if chunked:
            # staged pipeline: a worker thread uploads group N+1's
            # sources while group N computes on device and group N-1's
            # CABAC runs on the entropy thread (3-stage overlap)
            gen = genc.encode_groups_pipelined(
                frames, groups, chunk=CH,
                qp_for_group=(lambda: rc.qp) if rc is not None else None)
            for grp, fut in gen:
                if stop_event is not None and stop_event.is_set():
                    for _, _, f_ in pending:
                        f_.cancel()
                    return "CANCELLED"
                if time.time() > deadline:
                    raise TimeoutError("per-file encode timeout")
                pending.append((i, [e[1] for e in grp], fut))
                i += len(grp)
                while len(pending) > 2:
                    drain_one()
        else:
            while i < total:
                if stop_event is not None and stop_event.is_set():
                    for _, _, fut in pending:
                        fut.cancel()
                    return "CANCELLED"
                if time.time() > deadline:
                    raise TimeoutError("per-file encode timeout")
                cur_qp = rc.qp if rc is not None else cfg.qp
                f = frames[i]
                is_idr = i % gop == 0
                fut = genc.encode_next_async(
                    np.asarray(f[0], np.int32), np.asarray(f[1], np.int32),
                    np.asarray(f[2], np.int32), idr=is_idr, qp=cur_qp)
                pending.append((i, 0 if is_idr else 1, fut))
                i += 1
                while len(pending) > 2:
                    drain_one()
        while pending:
            drain_one()
        if out_digests is not None and sched is not None:
            # decode-order digests from the chunk scans -> display index
            out_digests.update(
                (sched[i0 + j][0], d)
                for j, d in enumerate(genc.recon_digests) if d is not None)
        log.info("encode stats %s: %s", file_name, stats.summary())
        hdr_md = build_hdr_metadata(info)
        comp = None
        if sched is not None:
            syncs = [k + 1 for k, e in enumerate(sched) if e[1] == 0]
            if cfg.bframes:
                comp = [e[0] - k for k, e in enumerate(sched)]
        else:
            syncs = [k + 1 for k in range(total) if k % gop == 0]
        mux_mp4(out_path, samples, cfg, fps=fps,
                vps=write_vps(cfg), sps=write_sps(cfg), pps=write_pps(cfg),
                sync_samples=syncs, composition_offsets=comp,
                hdr_metadata=hdr_md, audio=audio)
        if fp is not None:
            from hevc_tpu.batch import resume as RZ
            RZ.clear_checkpoint(out_path)
        return "SUCCESS"

    i = len(samples)
    last_ckpt = i
    while i < total:
        if stop_event is not None and stop_event.is_set():
            return "CANCELLED"
        if time.time() > deadline:
            raise TimeoutError("per-file encode timeout")
        chunk = frames[i:i + batch_frames]
        if backend == "jax":
            nchunk = [(np.asarray(f[0], np.int32), np.asarray(f[1], np.int32),
                       np.asarray(f[2], np.int32)) for f in chunk]
            from dataclasses import replace as _dc_replace
            cur_qp = rc.qp if rc is not None else cfg.qp
            bcfg = _dc_replace(cfg, qp=cur_qp) if cur_qp != cfg.qp else cfg
            if nxn:
                from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1
                from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
                rs = RowScanEncoderV1(cur_qp, cfg.bit_depth)
                results = rs.encode_frames_tiled(
                    nchunk, cfg.tile_cols, cfg.tile_rows, want_recon=False)
                ent = entropy_encode_frame_v1
            else:
                from hevc_tpu.encoder.rowscan_jax import RowScanEncoder
                from hevc_tpu.entropy.tiled import entropy_encode_frame_tiled
                rs = RowScanEncoder(cur_qp, cfg.bit_depth)
                results = rs.encode_frames_tiled(
                    nchunk, cfg.tile_cols, cfg.tile_rows)
                ent = entropy_encode_frame_tiled
            for r in results:
                nal = ent(bcfg, r)
                samples.append(length_prefixed([write_aud(0), nal]))
                if rc is not None:
                    rc.update(len(nal) * 8)
        else:
            for f in chunk:
                nal, _ = enc.encode_frame(np.asarray(f[0], np.int32),
                                          np.asarray(f[1], np.int32),
                                          np.asarray(f[2], np.int32))
                samples.append(length_prefixed([write_aud(0), nal]))
        i += len(chunk)
        if fp is not None and i - last_ckpt >= 32:
            from hevc_tpu.batch import resume as RZ
            RZ.save_checkpoint(out_path, fp, samples)
            last_ckpt = i
        if progress_callback:
            try:
                progress_callback(file_name, i, total)
            except Exception:
                pass

    hdr_md = build_hdr_metadata(info)
    mux_mp4(out_path, samples, cfg, fps=fps,
            vps=write_vps(cfg), sps=write_sps(cfg), pps=write_pps(cfg),
            hdr_metadata=hdr_md, audio=audio)
    if fp is not None:
        from hevc_tpu.batch import resume as RZ
        RZ.clear_checkpoint(out_path)
    return "SUCCESS"
