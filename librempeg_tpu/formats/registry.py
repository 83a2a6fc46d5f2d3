"""Container registry (allformats.c analog): importing this module
registers every built-in demuxer/muxer and protocol.

Imports are explicit and failures are LOUD (see codecs/registry.py for
the rationale; LIBREMPEG_TPU_LENIENT_REGISTRY=1 degrades to warnings).
"""
import os as _os

_LENIENT = _os.environ.get("LIBREMPEG_TPU_LENIENT_REGISTRY") == "1"

_MODULES = (
    "librempeg_tpu.formats.wav",
    "librempeg_tpu.formats.rawvideo",
    "librempeg_tpu.formats.rawes",
    "librempeg_tpu.formats.lavfi",
    "librempeg_tpu.formats.ogg",
    "librempeg_tpu.formats.hls",
    "librempeg_tpu.formats.rtp",
    "librempeg_tpu.formats.rtsp",
    "librempeg_tpu.formats.hlsdemux",
    "librempeg_tpu.formats.adts",
    "librempeg_tpu.formats.yuv4mpeg",
    "librempeg_tpu.formats.image2",
    "librempeg_tpu.formats.framehash",
    "librempeg_tpu.formats.rawaudio",
    "librempeg_tpu.formats.avi",
    "librempeg_tpu.formats.matroska",
    "librempeg_tpu.formats.mov",
    "librempeg_tpu.formats.flac",
    "librempeg_tpu.formats.mpegts",
    "librempeg_tpu.formats.srt",
    "librempeg_tpu.formats.gif",
    "librempeg_tpu.formats.mp3",
    "librempeg_tpu.formats.flv",
    "librempeg_tpu.formats.ac3",
    # protocols with import-time registration
    "librempeg_tpu.formats.http",
)


def _load():
    import importlib
    import sys

    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except Exception:
            if not _LENIENT:
                raise
            import traceback

            print(f"format registry: {mod} failed to load:",
                  file=sys.stderr)
            traceback.print_exc()


_load()
