"""swresample parity: soft compensation + dither/noise shaping.

Reference behavior: /root/reference/libswresample/resample.c:328
set_compensation (dst_incr scaling), dither.c (dither methods).
"""
from __future__ import annotations

import numpy as np
import pytest

from librempeg_tpu.resample import DITHER_METHODS, Ditherer, Resampler
from librempeg_tpu.utils import testgen


def snr_db(ref, x):
    err = ref - x
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-30))


class TestCompensation:
    def test_extra_output_length(self):
        """sample_delta extra outputs are produced over the
        compensation distance (swr_set_compensation contract)."""
        r = Resampler(48000, 48000, channels=1)
        x = testgen.sine(440.0, 48000, 48000, channels=1)
        r.set_compensation(sample_delta=480, compensation_distance=24000)
        y = np.concatenate([r.process(x), r.flush()], axis=1)
        # 48000 inputs at unity ratio + 480 stretched samples; the
        # period rounding of the comp bank bounds the error
        assert abs(y.shape[1] - 48480) <= 64

    def test_negative_delta_squeezes(self):
        r = Resampler(48000, 48000, channels=1)
        x = testgen.sine(440.0, 48000, 48000, channels=1)
        r.set_compensation(sample_delta=-480, compensation_distance=24000)
        y = np.concatenate([r.process(x), r.flush()], axis=1)
        assert abs(y.shape[1] - 47520) <= 64

    def test_reverts_to_ideal_after_distance(self):
        """After the compensation distance, the ratio must be the ideal
        one again: a long tail after compensation adds ~p/q samples per
        input sample."""
        r = Resampler(48000, 44100, channels=1)
        x = testgen.sine(1000.0, 48000, 96000, channels=1)
        r.set_compensation(200, 10000)
        y1 = r.process(x[:, :48000])
        n1 = y1.shape[1]
        assert r._comp is None  # compensation fully drained
        y2 = np.concatenate([r.process(x[:, 48000:]), r.flush()], axis=1)
        # total: ideal count + the injected delta (period rounding slack)
        assert abs((n1 + y2.shape[1]) - (88200 + 200)) <= 64

    def test_tone_quality_through_compensation(self):
        """The stretched stream remains a spectrally pure tone — no
        splice discontinuity at the bank switches (a splice click would
        smear broadband energy)."""
        rate = 48000
        r = Resampler(rate, rate, channels=1)
        x = testgen.sine(997.0, rate, 48000, channels=1)
        r.set_compensation(240, 24000)
        y = np.concatenate([r.process(x), r.flush()], axis=1)[0]
        core = y[1024:40960 + 1024] * np.hanning(40960)
        sp = np.abs(np.fft.rfft(core)) ** 2
        pk = int(np.argmax(sp))
        tone = sp[pk - 40:pk + 41].sum()   # comp chirps the tone a bit
        rest = sp.sum() - tone
        assert 10 * np.log10(tone / max(rest, 1e-30)) > 30.0

    def test_cancel(self):
        r = Resampler(48000, 44100, channels=1)
        r.set_compensation(100, 1000)
        r.set_compensation(0, 0)
        assert r._comp is None
        x = testgen.sine(1000.0, 48000, 48000, channels=1)
        y = np.concatenate([r.process(x), r.flush()], axis=1)
        assert y.shape[1] == 44100

    def test_invalid_args(self):
        r = Resampler(48000, 44100, channels=1)
        with pytest.raises(ValueError):
            r.set_compensation(10, -5)
        with pytest.raises(ValueError):
            r.set_compensation(10, 0)
        with pytest.raises(ValueError):
            r.set_compensation(2000, 1000)


class TestDither:
    def _tone(self, n=32768, amp=0.25):
        t = np.arange(n) / 48000.0
        return (amp * np.sin(2 * np.pi * 997.0 * t))[None, :].astype(
            np.float32)

    def test_methods_run_and_roundtrip(self):
        x = self._tone()
        for m in DITHER_METHODS:
            d = Ditherer(m)
            y = d.apply(x, "s16")
            assert y.dtype == np.int16
            back = y.astype(np.float32) / 32768.0
            # noise shapers trade total power for in-band power: the
            # flat-SNR floor is looser for them by design
            floor = 55.0 if m in ("lipshitz", "f_weighted") else 70.0
            assert snr_db(x, back) > floor, m

    def test_tpdf_breaks_quantization_harmonics(self):
        """Undithered quantization of a low-level tone creates harmonic
        distortion; TPDF dither converts it to noise — the harmonic
        lines must drop by >= 10 dB."""
        n = 65536
        t = np.arange(n) / 48000.0
        x = (2.5 / 32768.0 * np.sin(2 * np.pi * 997.0 * t))[None, :] \
            .astype(np.float32)

        def harmonic_power(y):
            sp = np.abs(np.fft.rfft(y[0].astype(np.float64))) ** 2
            f0 = round(997.0 * n / 48000.0)
            return sum(sp[k * f0 - 2:k * f0 + 3].sum()
                       for k in range(2, 8))

        hard = Ditherer("none").apply(x, "s16")
        soft = Ditherer("triangular").apply(x, "s16")
        ratio = harmonic_power(hard) / max(harmonic_power(soft), 1e-30)
        assert 10 * np.log10(ratio) > 10.0

    def test_noise_shaping_moves_noise_up(self):
        """Lipshitz shaping: in-band (0-4 kHz) quantization noise power
        must be lower than flat TPDF's, pushed to high frequencies."""
        x = self._tone(n=65536)

        def inband_noise(method):
            y = Ditherer(method).apply(x, "s16").astype(np.float64)
            err = y[0] / 32768.0 - x[0]
            sp = np.abs(np.fft.rfft(err)) ** 2
            n4k = round(4000.0 * 65536 / 48000.0)
            return sp[16:n4k].sum()

        flat = inband_noise("triangular")
        shaped = inband_noise("lipshitz")
        assert 10 * np.log10(flat / shaped) > 6.0

    def test_triangular_hp_spectrum(self):
        """High-passed TPDF: error spectrum below 2 kHz carries less
        power than above 20 kHz."""
        x = self._tone(n=65536)
        y = Ditherer("triangular_hp").apply(x, "s16").astype(np.float64)
        err = y[0] / 32768.0 - x[0]
        sp = np.abs(np.fft.rfft(err)) ** 2
        lo = sp[16:round(2000 * 65536 / 48000)].mean()
        hi = sp[round(20000 * 65536 / 48000):].mean()
        assert hi > 2.0 * lo

    def test_streaming_equals_oneshot(self):
        x = self._tone()
        one = Ditherer("lipshitz", seed=7).apply(x, "s16")
        d = Ditherer("lipshitz", seed=7)
        parts = [d.apply(x[:, :5000], "s16"), d.apply(x[:, 5000:], "s16")]
        np.testing.assert_array_equal(np.concatenate(parts, axis=1), one)

    def test_formats(self):
        x = self._tone(n=4096)
        for fmt, dt in (("u8", np.uint8), ("s16", np.int16),
                        ("s32", np.int32)):
            y = Ditherer("triangular").apply(x, fmt)
            assert y.dtype == dt
