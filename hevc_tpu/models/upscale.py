"""Super-resolution upscaling on TPU (reference upscale_gui_final.py parity).

The reference spawned a Python/torch RealESRGAN subprocess PER FRAME with PNG
round-trips (reference upscale_gui_final.py:128-148).  Here upscaling is a
resident jit-compiled model consuming device-side frame batches, feeding the
in-framework HEVC encoder directly (BASELINE.json config 4).

Engines:
  * "lanczos": separable Lanczos-3 resampling (jax.image.resize) — the
    default, deterministic, no weights needed.
  * "esrgan": RRDB network (RealESRGAN-class architecture) in plain JAX.
    Weights load from .npz (state_dict export); random init is for tests.

Behavior parity preserved from the reference:
  * auto target height: <1080 -> 1080, <2160 -> 2160, else keep (:81-87)
  * device tiering: batch size by device memory (:41-49)
  * pause/stop events, per-frame retry -> passthrough (:146-154)
"""
from __future__ import annotations

import logging


import numpy as np

log = logging.getLogger(__name__)


def auto_target_height(h: int) -> int:
    if h < 1080:
        return 1080
    if h < 2160:
        return 2160
    return h


def pick_batch_size() -> int:
    """Device-memory tiering (the reference's VRAM tiers, :41-49)."""
    try:
        import jax
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            gb = stats["bytes_limit"] / (1 << 30)
        else:
            gb = 16.0
    except Exception:
        gb = 4.0
    if gb >= 16:
        return 8
    if gb >= 8:
        return 4
    return 2


# --- Lanczos engine -----------------------------------------------------------

_resize_jit = None


def _resize_plane(x, out_h: int, out_w: int):
    global _resize_jit
    import jax
    if _resize_jit is None:
        _resize_jit = jax.jit(
            lambda v, h, w: jax.image.resize(v, (v.shape[0], h, w),
                                             method="lanczos3"),
            static_argnums=(1, 2))
    return _resize_jit(x, out_h, out_w)


def upscale_frames_lanczos(frames: list[tuple], target_h: int) -> list[tuple]:
    """Upscale a batch of (y, cb, cr) uint8 planes to target_h (even width)."""
    import jax.numpy as jnp
    h, w = frames[0][0].shape
    if target_h <= h:
        return frames
    out_h = target_h
    out_w = int(round(w * target_h / h / 2)) * 2
    y = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
    cb = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
    cr = jnp.asarray(np.stack([f[2] for f in frames]), jnp.float32)
    uy = np.asarray(jnp.clip(jnp.round(_resize_plane(y, out_h, out_w)), 0, 255),
                    dtype=np.uint8)
    ucb = np.asarray(jnp.clip(jnp.round(
        _resize_plane(cb, out_h // 2, out_w // 2)), 0, 255), dtype=np.uint8)
    ucr = np.asarray(jnp.clip(jnp.round(
        _resize_plane(cr, out_h // 2, out_w // 2)), 0, 255), dtype=np.uint8)
    return [(uy[i], ucb[i], ucr[i]) for i in range(len(frames))]


# --- ESRGAN (RRDB) engine -----------------------------------------------------

def init_rrdb_params(rng: np.random.Generator, nf: int = 64, nb: int = 6,
                     gc: int = 32, scale: int = 2) -> dict:
    """He-initialized RRDB network parameters (plain numpy pytree)."""
    def conv(cin, cout, k=3):
        fan = cin * k * k
        w = rng.normal(0, np.sqrt(2.0 / fan), (cout, cin, k, k)).astype(np.float32)
        return {"w": w * 0.1, "b": np.zeros(cout, np.float32)}

    params = {"first": conv(1, nf), "trunk": conv(nf, nf),
              "up": [conv(nf, nf) for _ in range(scale // 2)],
              "hr": conv(nf, nf), "last": conv(nf, 1), "blocks": []}
    for _ in range(nb):
        block = []
        for _ in range(3):              # 3 dense blocks per RRDB
            dense = [conv(nf + i * gc, gc) for i in range(4)]
            dense.append(conv(nf + 4 * gc, nf))
            block.append(dense)
        params["blocks"].append(block)
    params["scale"] = scale
    return params


def _conv2d(x, p):
    import jax
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + p["b"][None, :, None, None]


def rrdb_forward(params: dict, y: "jnp.ndarray"):
    """y: (N, 1, H, W) float32 in [0,1] -> upscaled (N, 1, sH, sW)."""
    import jax
    import jax.numpy as jnp
    lrelu = lambda v: jnp.maximum(v, 0.2 * v)
    fea = _conv2d(y, params["first"])
    trunk = fea
    for block in params["blocks"]:
        bin_ = trunk
        for dense in block:
            x = bin_
            feats = [x]
            for conv_p in dense[:-1]:
                out = lrelu(_conv2d(jnp.concatenate(feats, axis=1), conv_p))
                feats.append(out)
            x5 = _conv2d(jnp.concatenate(feats, axis=1), dense[-1])
            bin_ = bin_ + 0.2 * x5
        trunk = trunk + 0.2 * bin_
    fea = fea + _conv2d(trunk, params["trunk"])
    for up_p in params["up"]:
        n, c, h, w = fea.shape
        fea = jax.image.resize(fea, (n, c, h * 2, w * 2), "nearest")
        fea = lrelu(_conv2d(fea, up_p))
    fea = lrelu(_conv2d(fea, params["hr"]))
    return _conv2d(fea, params["last"])


def load_esrgan_weights(path) -> dict:
    """Load an RRDB parameter pytree from .npz (flat key format)."""
    data = np.load(path, allow_pickle=True)
    return data["params"].item() if "params" in data else dict(data)


# --- pipeline ------------------------------------------------------------------

def upscale_video(in_path, out_path, target_height: int | None = None,
                  engine: str = "lanczos", esrgan_weights=None,
                  batch: int | None = None, progress_callback=None,
                  stop_event=None, pause_event=None, retries: int = 1,
                  frame_blend_double: bool = False, qp: int | None = None,
                  interpolate: str = "mc") -> dict:
    """Upscale + HEVC-encode a video (reference process_video parity).

    Returns {"file", "status", "frames", "size"}.
    """
    import time
    from pathlib import Path
    from hevc_tpu.io.probe import probe_media
    from hevc_tpu.batch.transcode import _read_frames, _encode_to_mp4
    from hevc_tpu.planner.levels import select_level
    from hevc_tpu.planner.rate import calculate_dynamic_values

    in_path = Path(in_path)
    out_path = Path(out_path)
    result = {"file": in_path.name, "status": "FAILED", "frames": 0, "size": 0}
    info = probe_media(in_path)
    frames = _read_frames(in_path, info)
    if not frames:
        return result
    h = frames[0][0].shape[0]
    target = target_height or auto_target_height(h)
    batch = batch or pick_batch_size()

    params = None
    if engine == "esrgan":
        params = (load_esrgan_weights(esrgan_weights) if esrgan_weights
                  else init_rrdb_params(np.random.default_rng(0)))

    out_frames = []
    i = 0
    while i < len(frames):
        if stop_event is not None and stop_event.is_set():
            result["status"] = "CANCELLED"
            return result
        while pause_event is not None and pause_event.is_set():
            time.sleep(0.1)
        chunk = frames[i:i + batch]
        done = None
        for attempt in range(retries + 1):
            try:
                if engine == "esrgan" and target > h:
                    done = _esrgan_chunk(chunk, params, target)
                else:
                    done = upscale_frames_lanczos(chunk, target)
                break
            except Exception as e:
                log.warning("upscale chunk failed (attempt %d): %s",
                            attempt + 1, e)
        if done is None:      # retry exhausted -> passthrough (reference :146)
            done = chunk
        out_frames.extend(done)
        i += len(chunk)
        if progress_callback:
            progress_callback(in_path.name, i, len(frames))

    if frame_blend_double:
        # fps doubling by MOTION-COMPENSATED interpolation (the reference's
        # minterpolate mci/aobmc path, upscale_gui_final.py:190-198): block
        # motion search between neighbors + smoothed-field bidirectional
        # pull.  interpolate="blend" keeps the legacy frame average.
        if interpolate == "mc":
            from hevc_tpu.ops.minterp import mc_interpolate_pair
            mid = lambda a, b: mc_interpolate_pair(a, b)  # noqa: E731
        else:
            mid = lambda a, b: tuple(  # noqa: E731
                ((np.asarray(x, np.uint16) + np.asarray(z, np.uint16) + 1)
                 // 2).astype(np.uint8) for x, z in zip(a, b))
        blended = []
        for a, b in zip(out_frames, out_frames[1:]):
            blended.append(a)
            blended.append(mid(a, b))
        blended.append(out_frames[-1])
        out_frames = blended

    # encode the upscaled frames with the in-framework encoder
    info.width = out_frames[0][0].shape[1]
    info.height = out_frames[0][0].shape[0]
    level = select_level(info)
    plan = calculate_dynamic_values(info)
    _encode_to_mp4(out_frames, info, level, qp or plan.qp, out_path,
                   backend="jax", batch_frames=8,
                   progress_callback=progress_callback,
                   file_name=in_path.name, stop_event=stop_event,
                   deadline=time.time() + 3600)
    result["status"] = "SUCCESS"
    result["frames"] = len(out_frames)
    result["size"] = out_path.stat().st_size
    return result


def _esrgan_chunk(chunk, params, target_h):
    import jax.numpy as jnp
    h, w = chunk[0][0].shape
    scale = params.get("scale", 2)
    y = jnp.asarray(np.stack([f[0] for f in chunk]),
                    jnp.float32)[:, None] / 255.0
    out = rrdb_forward(params, y)
    out = np.asarray(jnp.clip(jnp.round(out[:, 0] * 255.0), 0, 255),
                     dtype=np.uint8)
    upscaled = []
    for i, (fy, fcb, fcr) in enumerate(chunk):
        uy = out[i]
        ucb = np.asarray(fcb, np.uint8).repeat(scale, 0).repeat(scale, 1)
        ucr = np.asarray(fcr, np.uint8).repeat(scale, 0).repeat(scale, 1)
        upscaled.append((uy, ucb, ucr))
    if upscaled[0][0].shape[0] != target_h:
        upscaled = upscale_frames_lanczos(upscaled, target_h)
    return upscaled
