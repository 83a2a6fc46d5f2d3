"""Filter registry (allfilters.c analog)."""
from librempeg_tpu.filters import audio, metrics, sources, video  # noqa: F401
