"""Codec registry (allcodecs.c analog): importing this registers all
built-in decoders/encoders.

Imports are explicit and failures are LOUD: a broken codec module (or a
stale native build) must fail the build, not silently shrink the codec
set — the reference's registry is compile-time explicit for the same
reason (allcodecs.c). Set LIBREMPEG_TPU_LENIENT_REGISTRY=1 to degrade
to warnings (for bisecting a broken tree only).
"""
import os as _os

_LENIENT = _os.environ.get("LIBREMPEG_TPU_LENIENT_REGISTRY") == "1"

_MODULES = (
    "librempeg_tpu.codecs.pcm",
    "librempeg_tpu.codecs.adpcm",
    "librempeg_tpu.codecs.ac3.decoder",
    "librempeg_tpu.codecs.ac3.encoder",
    "librempeg_tpu.codecs.mpegaudio",
    "librempeg_tpu.codecs.mp3dec",
    "librempeg_tpu.codecs.vorbis.decoder",
    "librempeg_tpu.codecs.opus.codec",
    "librempeg_tpu.codecs.rawvideo",
    "librempeg_tpu.codecs.gif",
    "librempeg_tpu.codecs.jpeg.decoder",
    "librempeg_tpu.codecs.jpeg.encoder",
    "librempeg_tpu.codecs.png.codec",
    "librempeg_tpu.codecs.mpeg4.encoder",
    "librempeg_tpu.codecs.mpeg4.decoder",
    "librempeg_tpu.codecs.aac.codec",
    "librempeg_tpu.codecs.aac.decoder",
    "librempeg_tpu.codecs.h264.codec",
    "librempeg_tpu.codecs.hevc.decoder",
    "librempeg_tpu.codecs.mpeg12.decoder",
    "librempeg_tpu.codecs.mpeg12.encoder",
    "librempeg_tpu.codecs.subtitles",
    "librempeg_tpu.codecs.flac.codec",
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

            print(f"codec registry: {mod} failed to load:",
                  file=sys.stderr)
            traceback.print_exc()


_load()
