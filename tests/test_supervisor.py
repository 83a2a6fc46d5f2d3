"""Output recovery supervisor (fifo.c analog) under fault injection."""
import numpy as np
import pytest

from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.sched.supervisor import RecoveringMuxer


class FlakySink:
    """Muxer stub whose write fails on a scripted schedule."""

    def __init__(self, fail_on=()):
        self.fail_on = set(fail_on)
        self.calls = 0
        self.written = []
        self.streams = []
        self.trailer = False

    def write_header(self):
        pass

    def write(self, pkt):
        self.calls += 1
        if self.calls in self.fail_on:
            raise OSError("simulated downstream failure")
        self.written.append(bytes(pkt.data))

    def write_trailer(self):
        self.trailer = True


def pkt(i):
    return Packet(data=bytes([i]) * 4, pts=i, dts=i, duration=1,
                  flags=PktFlags.KEY, time_base=Rational(1, 25))


class TestRecoveringMuxer:
    def test_transparent_when_healthy(self):
        sink = FlakySink()
        m = RecoveringMuxer(sink)
        for i in range(5):
            m.write(pkt(i))
        m.write_trailer()
        assert sink.written == [bytes([i]) * 4 for i in range(5)]
        assert sink.trailer
        assert m.stats == {"written": 5, "dropped": 0, "recoveries": 0,
                           "failed_writes": 0}

    def test_recovers_from_transient_failure(self):
        sink = FlakySink(fail_on={2, 3})   # 2nd/3rd write attempts fail
        m = RecoveringMuxer(sink, max_recovery_attempts=5)
        for i in range(4):
            m.write(pkt(i))
        m.write_trailer()
        # every packet eventually lands, in order
        assert sink.written == [bytes([i]) * 4 for i in range(4)]
        assert m.stats["recoveries"] >= 1
        assert m.stats["failed_writes"] == 2
        assert m.stats["dropped"] == 0

    def test_drops_after_max_attempts(self):
        # attempts 2..10 all fail: packet 1 exceeds its retry budget
        sink = FlakySink(fail_on=set(range(2, 11)))
        m = RecoveringMuxer(sink, max_recovery_attempts=3)
        for i in range(3):
            m.write(pkt(i))
        m.write_trailer()
        assert m.stats["dropped"] >= 1
        assert sink.trailer                 # pipeline still finished
        assert bytes([0]) * 4 in sink.written

    def test_blocking_mode_raises(self):
        sink = FlakySink(fail_on=set(range(2, 50)))
        m = RecoveringMuxer(sink, max_recovery_attempts=2,
                            drop_pkts_on_overflow=False)
        m.write(pkt(0))
        m.write(pkt(1))
        with pytest.raises(OSError):
            m.write_trailer()

    def test_overflow_drops_oldest(self):
        sink = FlakySink(fail_on=set(range(2, 100)))
        m = RecoveringMuxer(sink, queue_size=2, max_recovery_attempts=99)
        for i in range(6):
            m.write(pkt(i))
        assert m.stats["dropped"] >= 3      # bounded memory under outage
        assert len(m.queue) <= 2
