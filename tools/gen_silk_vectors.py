"""Generate SILK/hybrid-mode Opus packets with the system libopus
encoder (ctypes) for decoder cross-validation, and write them both as
raw length-prefixed packets and as an Ogg Opus file the reference
ffmpeg can decode for ground truth.

Usage: python tools/gen_silk_vectors.py OUT_PREFIX MODE BW CH DUR_MS \
           [BITRATE]
MODE: silk | hybrid;  BW: nb|mb|wb|swb|fb
Writes OUT_PREFIX.pkts (u32le count, then per packet u32le len + data)
and OUT_PREFIX.ogg.
"""
import ctypes
import struct
import sys

import numpy as np

OPUS_APPLICATION_VOIP = 2048
OPUS_SET_BITRATE = 4002
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_FORCE_MODE = 11002       # opus_private.h; honored by ctl
MODE_SILK_ONLY = 1000
MODE_HYBRID = 1001
BW = {"nb": 1101, "mb": 1102, "wb": 1103, "swb": 1104, "fb": 1105}


def make_signal(n, ch, sr=48000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    # speech-like: pitch pulses + formant-ish tones + noise bursts
    f0 = 110 + 30 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    sig = (0.4 * np.sin(phase) + 0.2 * np.sin(2.5 * phase)
           + 0.1 * np.sin(4.2 * phase))
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.3 * t))
    sig = sig * env + 0.02 * rng.standard_normal(n)
    sig[n // 3:n // 3 + 2000] = \
        0.3 * rng.standard_normal(2000)          # unvoiced burst
    sig[2 * n // 3:2 * n // 3 + 4000] *= 0.01    # near-silence
    cols = [sig] if ch == 1 else [sig, np.roll(sig, 113) * 0.8]
    return np.clip(np.stack(cols, 1), -0.95, 0.95).astype(np.float32)


def encode(mode, bw, ch, dur_ms, bitrate):
    lib = ctypes.CDLL("libopus.so.0")
    lib.opus_encoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    enc = lib.opus_encoder_create(48000, ch, OPUS_APPLICATION_VOIP,
                                  ctypes.byref(err))
    assert err.value == 0, err.value
    ctl = lib.opus_encoder_ctl
    ctl(ctypes.c_void_p(enc), OPUS_SET_BITRATE, ctypes.c_int(bitrate))
    ctl(ctypes.c_void_p(enc), OPUS_SET_BANDWIDTH, ctypes.c_int(BW[bw]))
    ctl(ctypes.c_void_p(enc), OPUS_SET_COMPLEXITY, ctypes.c_int(10))
    ctl(ctypes.c_void_p(enc), OPUS_SET_FORCE_MODE,
        ctypes.c_int(MODE_SILK_ONLY if mode == "silk"
                     else MODE_HYBRID))
    frame = 48000 * dur_ms // 1000
    sig = make_signal(48000 * 2, ch)
    out = ctypes.create_string_buffer(4000)
    pkts = []
    for i in range(0, len(sig) - frame + 1, frame):
        chunk = np.ascontiguousarray(sig[i:i + frame])
        n = lib.opus_encode_float(
            ctypes.c_void_p(enc),
            chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, out, 4000)
        assert n > 0, n
        pkts.append(bytes(out.raw[:n]))
    return pkts, sig


def ogg_page(serial, seq, granule, packets, flags=0):
    segs = b""
    lace = []
    for p in packets:
        n = len(p)
        while n >= 255:
            lace.append(255)
            n -= 255
        lace.append(n)
        segs += p
    hdr = struct.pack("<4sBBqIII", b"OggS", 0, flags, granule, serial,
                      seq, 0) + bytes([len(lace)]) + bytes(lace)
    crc = _ogg_crc(hdr + segs)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + segs


def _ogg_crc(data):
    # CRC-32 poly 0x04C11DB7, init 0, no reflection (Ogg flavor)
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def write_ogg(path, pkts, ch, dur_ms, pre_skip=312):
    head = b"OpusHead" + bytes([1, ch]) + struct.pack("<H", pre_skip) \
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    tags = b"OpusTags" + struct.pack("<I", 2) + b"me" \
        + struct.pack("<I", 0)
    out = ogg_page(1, 0, 0, [head], flags=2)
    out += ogg_page(1, 1, 0, [tags])
    gran = 0
    frame = 48000 * dur_ms // 1000
    for i, p in enumerate(pkts):
        gran += frame
        last = i == len(pkts) - 1
        out += ogg_page(1, 2 + i, gran - pre_skip if last else gran,
                        [p], flags=4 if last else 0)
    open(path, "wb").write(out)


def main():
    prefix, mode, bw, ch, dur = sys.argv[1:6]
    bitrate = int(sys.argv[6]) if len(sys.argv) > 6 else 24000
    ch = int(ch)
    dur = int(dur)
    pkts, sig = encode(mode, bw, ch, dur, bitrate)
    with open(prefix + ".pkts", "wb") as f:
        f.write(struct.pack("<I", len(pkts)))
        for p in pkts:
            f.write(struct.pack("<I", len(p)) + p)
    write_ogg(prefix + ".ogg", pkts, ch, dur)
    cfgs = sorted({p[0] >> 3 for p in pkts})
    print(f"{len(pkts)} packets, TOC configs {cfgs}")


if __name__ == "__main__":
    main()
