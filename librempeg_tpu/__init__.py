"""librempeg_tpu — a TPU-native media processing framework.

A from-scratch reimplementation of the capabilities of librempeg/FFmpeg
(demux -> decode -> filter graph -> encode -> mux, plus audio resampling,
video scaling/color conversion, probing, and ffmpeg/ffprobe-style CLIs),
designed TPU-first:

* All pixel/sample math (transforms, FIR scaling/resampling, color
  conversion, motion estimation/compensation, filters) runs device-side as
  XLA/Pallas programs over batched frames resident in HBM.
* Filter graphs compile to a single jitted device program per shape bucket.
* The host handles containers, entropy coding (C++ extension where hot),
  and pipeline orchestration.
* Multi-chip scaling uses jax.sharding Meshes (data-parallel frame batches,
  spatially sharded rows with halo exchange, pipelined stages) — the
  TPU-native analog of the reference's frame/slice/wavefront threading
  (see SURVEY.md §2.10).

Layer map (mirrors the reference's strict bottom-up layering,
/root/reference layout, but re-architected for JAX/XLA):

    cli/        ffmpeg/ffprobe-compatible CLIs         (fftools)
    sched/      pipeline DAG orchestrator              (ffmpeg_sched.c)
    filters/    filter graph over decoded frames       (libavfilter)
    formats/    containers, probing, byte I/O          (libavformat)
    codecs/     codecs, parsers, bitstream filters     (libavcodec)
    scale/  resample/   pixel & audio DSP engines      (libswscale, libswresample)
    ops/        device kernel library (tx, DCT, FIR, ME, colorspace)
    parallel/   device meshes, sharding, halo exchange
    core/       frames, packets, rational time, formats, options, logging
"""

__version__ = "0.1.0"

from librempeg_tpu.core.rational import Rational  # noqa: F401
from librempeg_tpu.core.frame import VideoFrame, AudioFrame  # noqa: F401
from librempeg_tpu.core.packet import Packet  # noqa: F401
