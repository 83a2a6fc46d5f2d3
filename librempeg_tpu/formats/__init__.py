"""Container & I/O layer (libavformat analog)."""
from librempeg_tpu.formats.api import (  # noqa: F401
    CodecParameters,
    Demuxer,
    Muxer,
    Stream,
    demuxers,
    guess_format,
    muxers,
    open_input,
    open_input_bytes,
    open_output,
    open_output_bytes,
    probe_format,
)
from librempeg_tpu.formats.io import IOContext, MemoryIO, open_io  # noqa: F401
