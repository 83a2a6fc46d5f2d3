"""Filter graph layer (libavfilter analog)."""
from librempeg_tpu.filters.filter import (  # noqa: F401
    Filter,
    SourceFilter,
    StreamProps,
    filters,
    find_filter,
    register_filter,
)
from librempeg_tpu.filters.graph import (  # noqa: F401
    BufferSink,
    BufferSource,
    FilterGraph,
    GraphRunner,
)
from librempeg_tpu.filters.parser import parse_description  # noqa: F401
