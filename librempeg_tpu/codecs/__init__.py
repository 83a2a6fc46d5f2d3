"""Codec layer (libavcodec analog)."""
from librempeg_tpu.codecs.api import (  # noqa: F401
    CodecInfo,
    Decoder,
    Encoder,
    decoders,
    encoders,
    find_decoder,
    find_encoder,
)
