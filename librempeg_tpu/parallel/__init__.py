"""Multi-device scaling: meshes, shardings, halo exchange, pipelines.

The TPU-native replacement for the reference's threading layers
(SURVEY.md §2.10): data parallel = frame batches over 'data' axis;
tensor/spatial parallel = row-sharded frames with halo exchange over
'spatial'; pipeline parallel = stage meshes (sched layer).
"""
from librempeg_tpu.parallel.mesh import (  # noqa: F401
    factor2,
    frame_sharding,
    make_mesh,
    replicated,
)
from librempeg_tpu.parallel.pipeline import (  # noqa: F401
    make_sharded_step,
    transcode_step,
)
