"""Subtitle pipeline: srt/ass decode, mkv track mapping, extraction,
burn-in filter (vf_subtitles.c / srtdec.c / assdec.c roles)."""
import subprocess
import sys

import numpy as np
import pytest

from conftest import reference_ffmpeg

SRT = """1
00:00:00,000 --> 00:00:01,000
Hello <i>world</i>

2
00:00:01,500 --> 00:00:02,500
Second line
with wrap

"""


def _write_srt(tmp_path):
    p = tmp_path / "subs.srt"
    p.write_text(SRT)
    return p


def test_load_cues(tmp_path):
    from librempeg_tpu.codecs.subtitles import load_cues

    cues = load_cues(str(_write_srt(tmp_path)))
    assert len(cues) == 2
    assert cues[0].text == "Hello world"     # markup stripped
    assert "with wrap" in cues[1].text


def test_ass_event_decode():
    from librempeg_tpu.codecs.subtitles import AssDecoder
    from librempeg_tpu.core.packet import Packet
    from librempeg_tpu.core.rational import Rational

    dec = AssDecoder()
    pkt = Packet(data=br"1,0,Default,,0,0,0,,{\i1}Styled{\i0}\Ntext",
                 pts=0, duration=1000, time_base=Rational(1, 1000))
    cues = dec.decode(pkt)
    assert cues[0].text == "Styled\ntext"


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
def test_mkv_subtitle_track_extraction(tmp_path):
    """Reference muxes srt into mkv; we probe + extract back to srt."""
    srt = _write_srt(tmp_path)
    mkv = tmp_path / "s.mkv"
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", str(srt),
         "-c:s", "copy", "-y", str(mkv)],
        check=True, capture_output=True)
    # ffprobe shows the subtitle stream
    r = subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffprobe", str(mkv)],
        capture_output=True, text=True, check=True)
    assert "codec_type=subtitle" in r.stdout
    # extraction
    out = tmp_path / "out.srt"
    subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
         "-i", str(mkv), str(out)], check=True, capture_output=True)
    text = out.read_text()
    assert "Hello" in text and "Second line" in text
    assert "00:00:01,500 --> 00:00:02,500" in text


def test_burn_in_filter(tmp_path):
    """Subtitled frames differ from clean ones exactly during cues."""
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.filters.filter import find_filter
    from librempeg_tpu.filters.filter import StreamProps
    from librempeg_tpu.utils import testgen

    srt = _write_srt(tmp_path)
    filt = find_filter("subtitles")(filename=str(srt))
    props = StreamProps(media="video", width=160, height=120,
                        pix_fmt="yuv420p", frame_rate=Rational(5, 1),
                        time_base=Rational(1, 5))
    filt.configure([props])
    changed = []
    for i in range(15):                 # 3 s at 5 fps
        y, u, v = testgen.video_yuv420(160, 120, 0)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=160,
                       height=120, pts=i, time_base=Rational(1, 5))
        (out,) = filt.filter_frame(f)
        changed.append(bool(np.any(np.asarray(out[1].planes[0]) != y)))
    # cues cover 0-1 s (frames 0-4) and 1.5-2.5 s (frames 8-12)
    assert changed[0] and changed[4]
    assert not changed[5] and not changed[6]
    assert changed[8] and changed[12]
    assert not changed[13]
