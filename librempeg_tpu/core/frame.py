"""Media frames.

Analog of AVFrame (/root/reference/libavutil/frame.h:472) re-designed for
JAX: a frame is an immutable pytree whose leaves are the plane arrays
(numpy on host, jax.Array once on device) and whose metadata (format,
timestamps, timebase, color properties, side data) is static aux data.

Differences from the reference, by design:
* No refcounting/buffer pools — JAX arrays are immutable and garbage
  collected; HBM residency is managed by jax.device_put / donation.
* No per-plane linesize/padding — arrays are dense; alignment is the
  compiler's job.
* Batch-first: device code operates on stacked frames ([N, H, W] per
  plane); `stack`/`unstack` convert between per-frame and batched forms.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np

from librempeg_tpu.core import pixfmt as _pixfmt
from librempeg_tpu.core import samplefmt as _samplefmt
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.core.samplefmt import ChannelLayout


class PictType:
    NONE = "?"
    I = "I"  # noqa: E741
    P = "P"
    B = "B"


@dataclass(frozen=True)
class VideoFrame:
    """One video frame: per-plane dense arrays + metadata.

    `planes` are numpy or jax arrays; shapes follow the format descriptor
    (e.g. yuv420p 1080x1920 -> ((1080,1920), (540,960), (540,960))).
    Packed-RGB formats store a single [H, W, C] plane.
    """

    planes: tuple[Any, ...]
    format: str                      # pixfmt name
    width: int
    height: int
    pts: int = NOPTS
    time_base: Rational = Rational(1, 25)
    duration: int = 0
    pict_type: str = PictType.NONE
    key_frame: bool = True
    color_range: str = "unspecified"  # "mpeg" | "jpeg" | "unspecified"
    sample_aspect_ratio: Rational = Rational(0, 1)
    interlaced: bool = False
    side_data: dict = field(default_factory=dict, compare=False)

    @property
    def desc(self) -> _pixfmt.PixFmtDesc:
        return _pixfmt.get(self.format)

    def replace(self, **kw) -> "VideoFrame":
        return dataclasses.replace(self, **kw)

    def to_device(self) -> "VideoFrame":
        """Upload planes to the default device (hwframe upload analog)."""
        return self.replace(planes=tuple(jax.device_put(p) for p in self.planes))

    def to_host(self) -> "VideoFrame":
        return self.replace(planes=tuple(np.asarray(p) for p in self.planes))

    def validate(self) -> "VideoFrame":
        d = self.desc
        if len(self.planes) != d.nb_planes:
            raise ValueError(
                f"{self.format}: expected {d.nb_planes} planes, got {len(self.planes)}"
            )
        for i, p in enumerate(self.planes):
            ph, pw = d.plane_shape(i, self.height, self.width)
            ncomp = len(d.planes[i].components)
            want = (ph, pw) if ncomp == 1 else (ph, pw, ncomp)
            if tuple(p.shape) != want:
                raise ValueError(
                    f"{self.format} plane {i}: expected shape {want}, got {tuple(p.shape)}"
                )
        return self

    @property
    def end_pts(self) -> int:
        if self.pts == NOPTS:
            return NOPTS
        return self.pts + self.duration


@dataclass(frozen=True)
class AudioFrame:
    """A block of audio: `data` shaped [channels, nb_samples] (planar).

    Device convention is planar regardless of source packing; `sample_fmt`
    records the *logical* format (dtype of `data` matches its dtype).
    """

    data: Any
    sample_rate: int
    sample_fmt: str = "fltp"
    layout: ChannelLayout = _samplefmt.STEREO
    pts: int = NOPTS
    time_base: Rational = Rational(0, 1)  # defaults to 1/sample_rate when invalid
    side_data: dict = field(default_factory=dict, compare=False)

    def __post_init__(self):
        if not self.time_base.valid or self.time_base.num == 0:
            object.__setattr__(self, "time_base", Rational(1, self.sample_rate))

    @property
    def nb_channels(self) -> int:
        return int(self.data.shape[0])

    @property
    def nb_samples(self) -> int:
        return int(self.data.shape[1])

    @property
    def duration(self) -> int:
        # duration in time_base units; exact when time_base == 1/sample_rate
        from librempeg_tpu.core.rational import rescale_q

        return rescale_q(self.nb_samples, Rational(1, self.sample_rate), self.time_base)

    def replace(self, **kw) -> "AudioFrame":
        return dataclasses.replace(self, **kw)

    def to_device(self) -> "AudioFrame":
        return self.replace(data=jax.device_put(self.data))

    def to_host(self) -> "AudioFrame":
        return self.replace(data=np.asarray(self.data))


# -- pytree registration ----------------------------------------------------
# Plane arrays are children; everything else is aux. This lets frames cross
# jit boundaries directly (shapes/metadata become static).

def _vf_flatten(f: VideoFrame):
    aux = tuple(
        getattr(f, fld.name) for fld in dataclasses.fields(VideoFrame)
        if fld.name not in ("planes", "side_data")
    )
    return f.planes, aux


def _vf_unflatten(aux, planes):
    names = [f.name for f in dataclasses.fields(VideoFrame)
             if f.name not in ("planes", "side_data")]
    return VideoFrame(planes=tuple(planes), **dict(zip(names, aux)))


def _af_flatten(f: AudioFrame):
    aux = tuple(
        getattr(f, fld.name) for fld in dataclasses.fields(AudioFrame)
        if fld.name not in ("data", "side_data")
    )
    return (f.data,), aux


def _af_unflatten(aux, children):
    names = [f.name for f in dataclasses.fields(AudioFrame)
             if f.name not in ("data", "side_data")]
    return AudioFrame(data=children[0], **dict(zip(names, aux)))


jax.tree_util.register_pytree_node(VideoFrame, _vf_flatten, _vf_unflatten)
jax.tree_util.register_pytree_node(AudioFrame, _af_flatten, _af_unflatten)


# -- batching helpers -------------------------------------------------------

def stack_video(frames: list[VideoFrame]) -> VideoFrame:
    """Stack same-shape frames into one batched frame ([N,...] planes).

    This is the fundamental TPU-ingest op: device programs are written over
    batches, giving data parallelism the reference obtains from frame
    threading (pthread_frame.c) for free.
    """
    f0 = frames[0]
    import jax.numpy as jnp

    planes = tuple(
        jnp.stack([jnp.asarray(f.planes[i]) for f in frames])
        for i in range(len(f0.planes))
    )
    return f0.replace(planes=planes, side_data={"batch_pts": [f.pts for f in frames]})


def unstack_video(batched: VideoFrame) -> list[VideoFrame]:
    n = int(batched.planes[0].shape[0])
    pts_list = batched.side_data.get("batch_pts", [NOPTS] * n)
    return [
        batched.replace(
            planes=tuple(p[i] for p in batched.planes),
            pts=pts_list[i],
            side_data={},
        )
        for i in range(n)
    ]
