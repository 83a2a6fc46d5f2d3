"""Trellis (RD) quantization: lattice optimality and encoder parity
with the reference `-trellis 2` (size/PSNR gate from the build plan).
"""
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

W, H = 176, 144


def _content():
    rng = np.random.default_rng(7)
    from numpy.lib.stride_tricks import sliding_window_view
    big = rng.integers(0, 256, (H + 100, W + 100)).astype(np.float32)
    sm = np.clip(sliding_window_view(big, (7, 7)).mean(axis=(2, 3)),
                 0, 255).astype(np.uint8)
    frames = []
    for i in range(15):
        frames.append((sm[20 + i:20 + i + H, 20 + 2 * i:20 + 2 * i + W],
                       sm[10:10 + H // 2, 12 + i:12 + i + W // 2],
                       sm[5:5 + H // 2, 30 + i:30 + i + W // 2]))
    return frames


def test_lattice_beats_uniform_quant_rd():
    """The Viterbi lattice never does worse than uniform quantization
    under its own rate-distortion objective."""
    import jax.numpy as jnp

    from librempeg_tpu.codecs.mpeg4 import tables as T
    from librempeg_tpu.codecs.mpeg4 import trellis as TR

    q = 6
    rng = np.random.default_rng(11)

    def rdcost(c, lv, first):
        idx = T.INTRA_RL_INDEX if first == 1 else T.INTER_RL_INDEX
        even = 1 - (q & 1)
        lam = 0.85 * q * q
        nz = [i for i in range(first, 64) if lv[i]]
        cost, prev = 0.0, first - 1
        for k, i in enumerate(nz):
            for j in range(prev + 1, i):
                cost += c[j] * c[j]
            al = abs(lv[i])
            cost += ((2 * al + 1) * q - even - abs(c[i])) ** 2
            ent = idx.get((1 if k == len(nz) - 1 else 0, i - prev - 1,
                           al))
            cost += lam * (ent[1] + 1 if ent else 30)
            prev = i
        for j in range(prev + 1, 64):
            cost += c[j] * c[j]
        return cost

    for first in (0, 1):
        cs = np.zeros((32, 64), np.float32)
        for b in range(32):
            k = rng.integers(1, 8)
            pos = rng.choice(np.arange(first, 40), k, replace=False)
            cs[b, pos] = rng.normal(0, 4 * q, k)
        out = np.asarray(TR.quantize_rd(jnp.asarray(cs), q,
                                        first == 1, first))
        for b in range(32):
            uni = np.trunc(np.abs(cs[b]) / (2 * q)).astype(int) \
                * np.sign(cs[b]).astype(int)
            uni[:first] = 0
            assert (rdcost(cs[b], list(out[b]), first)
                    <= rdcost(cs[b], list(uni), first) + 1e-3), b


@pytest.mark.skipif(reference_ffmpeg() is None,
                    reason="reference not built")
@pytest.mark.slow
def test_trellis_parity_with_reference(tmp_path):
    """Our -trellis stream: decodable by the reference, bit-exact in
    our own decoder, smaller than the plain stream, and within 5% of
    the reference encoder's -trellis 2 size and PSNR."""
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
    from librempeg_tpu.core.errors import EndOfStream
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.formats.api import open_input

    frames = _content()
    src = tmp_path / "src.yuv"
    src.write_bytes(b"".join(y.tobytes() + u.tobytes() + v.tobytes()
                             for y, u, v in frames))
    fsz = W * H * 3 // 2

    def ours(tr):
        enc = Mpeg4Encoder(width=W, height=H, framerate=Rational(25, 1),
                           qscale=5, gop_size=12, trellis=tr)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(VideoFrame(
                planes=(y, u, v), format="yuv420p", width=W, height=H,
                pts=i, time_base=Rational(1, 25)))
        pkts += enc.flush()
        p = tmp_path / f"our{tr}.m4v"
        p.write_bytes(b"".join(bytes(k.data) for k in pkts))
        return p

    def ff(tr):
        p = tmp_path / f"ff{tr}.m4v"
        args = [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
                "-pix_fmt", "yuv420p", "-s", f"{W}x{H}", "-r", "25",
                "-i", str(src), "-c:v", "mpeg4", "-q:v", "5",
                "-g", "12"]
        if tr:
            args += ["-trellis", str(tr)]
        subprocess.run(args + ["-y", str(p)], check=True)
        return p

    def refdec(p):
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(p),
             "-f", "rawvideo", "-"], capture_output=True)
        assert not r.stderr, r.stderr.decode()
        return np.frombuffer(r.stdout, np.uint8)

    def psnr(dec):
        n = dec.size // fsz
        tot = 0.0
        for i in range(n):
            a = frames[i][0].astype(np.float64)
            b = dec[i * fsz:i * fsz + W * H].reshape(H, W) \
                .astype(np.float64)
            tot += ((a - b) ** 2).mean()
        return 10 * np.log10(255 * 255 / (tot / n))

    our_p, our_t = ours(0), ours(2)
    ff_t = ff(2)
    dec_t = refdec(our_t)
    assert dec_t.size // fsz == 15
    # real compression win over the uniform quantizer
    assert our_t.stat().st_size < our_p.stat().st_size
    # parity gate vs the reference trellis encoder
    ff_dec = refdec(ff_t)
    ps_our, ps_ff = psnr(dec_t), psnr(ff_dec)
    assert our_t.stat().st_size <= ff_t.stat().st_size * 1.05, (
        our_t.stat().st_size, ff_t.stat().st_size)
    assert ps_our >= ps_ff * 0.95, (ps_our, ps_ff)
    # our decoder reproduces the reference decode of the trellis
    # stream sample-exactly
    d = open_input(str(our_t))
    dec2 = find_decoder("mpeg4")(d.streams[0].codecpar)
    outs = []
    while True:
        try:
            pk = d.read_packet()
        except EndOfStream:
            break
        outs += dec2.decode(pk)
    outs += dec2.flush()
    assert len(outs) == 15
    for i, f in enumerate(outs):
        ry = dec_t[i * fsz:i * fsz + W * H].reshape(H, W)
        np.testing.assert_array_equal(np.asarray(f.planes[0]), ry)
