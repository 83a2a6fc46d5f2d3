"""Codec registry (allcodecs.c analog): importing this registers all
built-in decoders/encoders."""
from librempeg_tpu.codecs import pcm  # noqa: F401

try:
    from librempeg_tpu.codecs import rawvideo  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.jpeg import decoder as _jpeg_dec  # noqa: F401
    from librempeg_tpu.codecs.jpeg import encoder as _jpeg_enc  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.png import codec as _png  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.mpeg4 import encoder as _m4enc  # noqa: F401
    from librempeg_tpu.codecs.mpeg4 import decoder as _m4dec  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.aac import codec as _aac  # noqa: F401
    from librempeg_tpu.codecs.aac import decoder as _aacdec  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.h264 import codec as _h264  # noqa: F401
except ImportError:
    pass
try:
    from librempeg_tpu.codecs.flac import codec as _flac  # noqa: F401
except ImportError:
    pass
