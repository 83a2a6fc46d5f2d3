"""drawtext filter: TTF rasterization + blending.

The rasterizer is our own (fontTools outlines, nonzero-winding scanline
fill) so there is no bit-exact reference; the tests assert structural
properties: glyphs produce ink with antialiased edges, text lands at
the requested position in the requested color, per-frame %{n}/%{pts}
expansion changes the rendering, and chroma planes are touched at the
subsampled location. Behavioral reference: libavfilter/vf_drawtext.c.
"""
import numpy as np
import pytest

import librempeg_tpu.filters.registry  # noqa: F401
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.filters.drawtext import (
    _DEFAULT_FONT,
    _expand,
    render_text,
)
from librempeg_tpu.filters.filter import _FILTERS, StreamProps


def _frame(w=160, h=120, pts=0):
    y = np.full((h, w), 60, np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                      height=h, pts=pts, time_base=Rational(1, 25))


def _run(f, frame):
    f.configure([StreamProps(media="video", width=frame.width,
                             height=frame.height, pix_fmt="yuv420p")])
    return f.filter_frame(frame)[0][1]


def test_rasterizer_coverage():
    cov = render_text("Hg!", _DEFAULT_FONT, 32)
    assert cov.ndim == 2 and cov.shape[0] >= 32
    assert cov.max() == 1.0                   # solid interiors
    frac = ((cov > 0.05) & (cov < 0.95)).sum() / max((cov > 0).sum(), 1)
    assert 0.05 < frac < 0.9                  # antialiased edges exist
    # deterministic
    assert np.array_equal(cov, render_text("Hg!", _DEFAULT_FONT, 32))


def test_draw_position_and_color():
    f = _FILTERS["drawtext"](text="X", x="40", y="20", fontsize=32,
                             fontcolor="white")
    out = _run(f, _frame())
    oy = np.asarray(out.planes[0])
    changed = np.argwhere(oy != 60)
    assert len(changed) > 20
    ys, xs = changed[:, 0], changed[:, 1]
    assert xs.min() >= 40 and ys.min() >= 20
    assert xs.max() < 40 + 32 and ys.max() < 20 + 40
    assert oy.max() == 235                    # video-range white


def test_box_and_chroma():
    f = _FILTERS["drawtext"](text="A", x="16", y="16", fontsize=24,
                             fontcolor="red", box=1, boxcolor="blue")
    out = _run(f, _frame())
    ou, ov = np.asarray(out.planes[1]), np.asarray(out.planes[2])
    # red ink: V well above neutral; blue box: U above neutral
    assert ov.max() > 200 and ou.max() > 200
    assert (ou != 128).any() and (ov != 128).any()
    # untouched far corner
    assert np.asarray(out.planes[0])[-8:, -8:].max() == 60


def test_expand_sequences():
    fr = _frame(pts=50)                       # 2.0 s at 1/25
    assert _expand("f=%{n} t=%{pts} 100%%", fr, 7) == \
        "f=7 t=2.000000 100%"
    assert "00:00:02.000" in _expand("%{pts\\:hms}", fr, 0)


def test_per_frame_counter_changes_render():
    f = _FILTERS["drawtext"](text="%{n}", x="0", y="0", fontsize=20,
                             fontcolor="white")
    f.configure([StreamProps(media="video", width=160, height=120,
                             pix_fmt="yuv420p")])
    a = np.asarray(f.filter_frame(_frame())[0][1].planes[0])
    b = np.asarray(f.filter_frame(_frame())[0][1].planes[0])
    assert not np.array_equal(a, b)


def test_clipping_offscreen():
    f = _FILTERS["drawtext"](text="edge", x="150", y="110",
                             fontsize=24, fontcolor="white")
    out = _run(f, _frame())                   # partially off-frame
    assert np.asarray(out.planes[0]).shape == (120, 160)
    f2 = _FILTERS["drawtext"](text="gone", x="500", y="500",
                              fontsize=24)
    out2 = _run(f2, _frame())
    assert np.asarray(out2.planes[0]).max() == 60   # fully clipped
