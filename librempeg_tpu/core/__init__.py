"""Core runtime: frames, packets, rational time, formats, options, logging.

Analog of libavutil (/root/reference/libavutil) — the bottom layer every
other package builds on.
"""
from librempeg_tpu.core.rational import (  # noqa: F401
    NOPTS,
    Rational,
    Rounding,
    compare_ts,
    rescale,
    rescale_q,
    rescale_q_rnd,
    rescale_rnd,
)
from librempeg_tpu.core.errors import (  # noqa: F401
    EndOfStream,
    InvalidData,
    MediaError,
    NotFound,
    TryAgain,
    Unsupported,
)
from librempeg_tpu.core.frame import (  # noqa: F401
    AudioFrame,
    VideoFrame,
    stack_video,
    unstack_video,
)
from librempeg_tpu.core.packet import Packet, PktFlags  # noqa: F401
from librempeg_tpu.core import pixfmt, samplefmt  # noqa: F401
from librempeg_tpu.core.options import (  # noqa: F401
    Option,
    OptionTable,
    OptionedObject,
    parse_opt_string,
)
