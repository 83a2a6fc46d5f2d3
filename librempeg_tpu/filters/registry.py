"""Filter registry (allfilters.c analog)."""
from librempeg_tpu.filters import (  # noqa: F401
    audio,
    metrics,
    sources,
    video,
    video2,
    loudness,
    misc,
    misc2,
    biquads,
    video3,
    drawtext,
    subtitles,
    color,
)
