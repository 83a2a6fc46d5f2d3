"""Container registry (allformats.c analog): importing this module
registers every built-in demuxer/muxer via their decorators."""
from librempeg_tpu.formats import wav  # noqa: F401

try:
    from librempeg_tpu.formats import rawvideo  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import rawes  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import lavfi  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import ogg  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import hls  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import adts  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import yuv4mpeg  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import image2  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import framehash  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import rawaudio  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import avi  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import matroska  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import mov  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import flac  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import mpegts  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import srt  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.formats import gif  # noqa: F401
except ImportError:
    pass
