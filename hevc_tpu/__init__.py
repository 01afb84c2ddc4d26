"""hevc_tpu — a TPU-native HEVC (H.265) batch-transcoding framework.

A brand-new framework with the capabilities of the reference Apple-HEVC batch
transcoder (uingei/hevc): probe -> auto-parameterize -> encode -> mux .mp4 ->
validate, batched across a worker pool.  Unlike the reference (which shells out
to ffmpeg/NVENC/libx265 subprocesses), the HEVC encode pipeline here is
in-framework: intra prediction, integer DCT/DST, quantization and mode search
run as JAX/XLA/Pallas programs on TPU, while CABAC entropy coding and MP4
muxing run as host-side finalize stages.

Public API parity (reference core/transcoder.py:537-638):
    from hevc_tpu import convert_video, batch_convert, probe_media
"""

__version__ = "0.1.0"

from hevc_tpu.io.videoinfo import VideoInfo  # noqa: F401

__all__ = ["VideoInfo", "convert_video", "batch_convert", "probe_media", "__version__"]


def __getattr__(name):  # lazy: keep `import hevc_tpu` light (no jax import)
    if name == "convert_video":
        from hevc_tpu.batch.transcode import convert_video
        return convert_video
    if name == "batch_convert":
        from hevc_tpu.batch.scheduler import batch_convert
        return batch_convert
    if name == "probe_media":
        from hevc_tpu.io.probe import probe_media
        return probe_media
    raise AttributeError(name)
