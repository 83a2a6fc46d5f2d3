"""Transcode pipeline orchestrator.

Analog of the reference's fftools scheduler (ffmpeg_sched.c — a DAG of
demux/decode/filter/encode/mux nodes with bounded queues and
backpressure; architecture doc ffmpeg_sched.h:31-87) plus the per-node
thread bodies (ffmpeg_demux.c/ffmpeg_dec.c/ffmpeg_filter.c/ffmpeg_enc.c/
ffmpeg_mux.c).

TPU-first differences:
* Stages are coroutine-style objects driven by one control loop instead
  of one pthread per node — device calls are already async (XLA dispatch)
  and the host is a single orchestrator; an optional thread pool overlaps
  host entropy coding with device compute (the reference's reason for
  threads) without the queue plumbing.
* Decoded frames flow as immutable arrays; the filter graph and encoder
  device-batch them internally.
* Interleaving/backpressure lives in the muxer's dts-ordered queue
  (formats/api.Muxer), matching av_interleaved_write_frame semantics.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.core.errors import EndOfStream, InvalidData, TryAgain
from librempeg_tpu.core.frame import AudioFrame, VideoFrame
from librempeg_tpu.core.log import Logger
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.filters import GraphRunner, StreamProps
from librempeg_tpu.formats.api import (
    CodecParameters,
    open_input,
    open_output,
)

log = Logger("transcode")


@dataclass
class StreamMap:
    """One output stream's processing chain configuration."""

    codec: str = ""                  # output codec name ("copy" = stream copy)
    filters: str = ""                # filter graph description
    codec_opts: dict = field(default_factory=dict)
    # output format overrides
    width: int = 0
    height: int = 0
    pix_fmt: str = ""
    sample_rate: int = 0
    channels: int = 0
    frames_limit: int = 0            # -frames:v analog; 0 = unlimited


@dataclass
class TranscodeSpec:
    input_url: str
    output_url: str
    input_format: str | None = None
    input_opts: dict = field(default_factory=dict)
    output_format: str | None = None
    video: StreamMap | None = None
    audio: StreamMap | None = None
    no_video: bool = False
    no_audio: bool = False
    duration: float = 0.0            # -t
    seek: float = 0.0
    mesh: str = ""                   # '-mesh data=2,spatial=4' device mesh                # -ss
    metadata: dict = field(default_factory=dict)   # -metadata key=value
    maps: list = field(default_factory=list)       # -map selectors


class _StreamChain:
    """decode -> filter -> encode for one stream."""

    def __init__(self, in_stream, smap: StreamMap, out_mux):
        self.in_stream = in_stream
        self.smap = smap
        par = in_stream.codecpar
        self.media = par.codec_type
        self.copy = smap.codec == "copy"
        self.frames_done = 0
        self.discard_until = 0.0     # -ss decode-and-discard threshold
        self.eof = False

        if self.copy:
            self.decoder = None
            self.graph = None
            self.encoder = None
            self.out_stream = out_mux.add_stream(par, in_stream.time_base)
            return

        self.decoder = find_decoder(par.codec_id)(par)

        # source props for the filter graph
        if self.media == "video":
            props = StreamProps(
                media="video", width=par.width, height=par.height,
                pix_fmt=par.pix_fmt or "yuv420p",
                frame_rate=par.framerate if par.framerate.num else
                Rational(25, 1),
                time_base=in_stream.time_base)
        else:
            from librempeg_tpu.core.samplefmt import ChannelLayout

            props = StreamProps(
                media="audio", sample_rate=par.sample_rate,
                sample_fmt="s16p",
                layout=ChannelLayout.default(par.nb_channels or 2),
                time_base=in_stream.time_base)

        desc = smap.filters or ("null" if self.media == "video" else "anull")
        # append conversion stages implied by output overrides
        extra = []
        if self.media == "video":
            if smap.width or smap.height:
                extra.append(f"scale={smap.width or -1}:{smap.height or -1}")
            if smap.pix_fmt:
                extra.append(f"format={smap.pix_fmt}")
        else:
            if smap.sample_rate:
                extra.append(f"aresample={smap.sample_rate}")
        if extra:
            desc = desc + "," + ",".join(extra)
        self.graph = GraphRunner(desc, props)

        out_props = self.graph.output_props
        enc_cls = find_encoder(smap.codec)
        enc_opts = self._translate_codec_opts(enc_cls, smap.codec_opts)
        if self.media == "video":
            self.encoder = enc_cls(
                width=out_props.width, height=out_props.height,
                pix_fmt=out_props.pix_fmt, **enc_opts)
            tb = out_props.time_base or Rational(1, 25)
        else:
            self.encoder = enc_cls(
                sample_rate=out_props.sample_rate,
                channels=(out_props.layout.nb_channels
                          if out_props.layout else 2),
                **enc_opts)
            tb = Rational(1, out_props.sample_rate)
        self.out_stream = out_mux.add_stream(
            self.encoder.codec_parameters(), tb)

        # pipelined encode: when the encoder exposes the two-phase
        # dispatch/finish API, a worker thread overlaps the device
        # result transfer + host VLC packing of frame i with the decode
        # of frame i+1 (the role of the reference scheduler's per-node
        # threads, ffmpeg_sched.h:31-87, collapsed to the one boundary
        # that matters on a TPU tunnel)
        self._pipelined = callable(
            getattr(self.encoder, "encode_async", None)) and \
            not getattr(self.encoder, "opts", {}).get(
                "max_b_frames", 0)
        if self._pipelined:
            import queue
            import threading

            self._pq: Any = queue.Queue(maxsize=4)
            self._perr: Exception | None = None
            self._pworker = threading.Thread(
                target=self._drain_encodes, daemon=True)
            self._pworker.start()

    def _drain_encodes(self) -> None:
        import queue

        while True:
            item = self._pq.get()
            if item is None:
                self._pq.task_done()
                return
            # drain everything already queued: fetching several frames'
            # device results in ONE device_get amortizes the transfer
            # round-trip latency (the dominant fixed cost on a tunneled
            # accelerator) across the batch
            batch = [item]
            while True:
                try:
                    nxt = self._pq.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._pq.put(None)      # re-queue the sentinel
                    self._pq.task_done()
                    break
                batch.append(nxt)
            try:
                import jax

                packed = [h.get("packed") if isinstance(h, dict)
                          else None for h, _ in batch]
                import numpy as np

                if len(batch) > 1 and all(
                        p is not None and not isinstance(p, np.ndarray)
                        for p in packed):
                    from librempeg_tpu.utils.stagetimer import stage

                    with stage("enc_finish.device_get"):
                        vals = jax.device_get(packed)
                    for (h, _), val in zip(batch, vals):
                        h["packed_np"] = np.asarray(val)

            except Exception:
                pass                        # per-frame fetch fallback
            from librempeg_tpu.utils.stagetimer import stage

            for handle, mux in batch:
                try:
                    with stage("enc_finish.worker"):
                        for pkt in self.encoder.encode_finish(handle):
                            mux.write(pkt.replace(
                                stream_index=self.out_stream.index))
                except Exception as e:      # propagated on next call
                    self._perr = e
                finally:
                    self._pq.task_done()

    def sync(self) -> None:
        """Block until every dispatched frame is packed and muxed."""
        if getattr(self, "_pipelined", False):
            self._pq.join()
        self._perr_check()

    def _join_encodes(self) -> None:
        if getattr(self, "_pipelined", False) and self._pworker.is_alive():
            self._pq.put(None)
            self._pworker.join()
        if getattr(self, "_perr", None) is not None:
            err, self._perr = self._perr, None
            raise err

    @staticmethod
    def _translate_codec_opts(enc_cls, codec_opts: dict) -> dict:
        """Map CLI-level options onto what the encoder declares
        (ffmpeg_opt.c's per-codec AVDictionary filtering analog);
        -q:v's 1..31 qscale maps onto JPEG-style quality when needed."""
        out = {}
        for k, v in codec_opts.items():
            if k == "quality_scale":
                if enc_cls.OPTIONS.get("qscale"):
                    out["qscale"] = v
                elif enc_cls.OPTIONS.get("quality"):
                    out["quality"] = int(max(2, min(100, round(100 - v * 3.1))))
            elif enc_cls.OPTIONS.get(k):
                out[k] = v
            else:
                log.warning("encoder %s: ignoring option %s",
                            enc_cls.INFO.name, k)
        return out

    # -- data flow ----------------------------------------------------
    def send_packet(self, pkt, mux) -> None:
        from librempeg_tpu.utils.stagetimer import stage

        if self.eof:
            return
        if self.copy:
            mux.write(pkt.replace(stream_index=self.out_stream.index))
            return
        with stage(f"{self.media}.decode"):
            frames = self.decoder.decode(pkt)
        for frame in frames:
            self._through_graph(frame, mux)

    def _through_graph(self, frame, mux, flush=False) -> None:
        # late format discovery (the ffmpeg.c decoder-reconfig path):
        # HE-AAC doubles the rate only once SBR is seen in-band, so
        # retune the chain off the first decoded frame
        if frame is not None and self.media == "audio" \
                and not getattr(self, "_afmt_locked", False):
            self._afmt_locked = True
            rate = getattr(frame, "sample_rate", 0)
            if rate and rate != self.graph.output_props.sample_rate \
                    and not self.smap.sample_rate \
                    and not mux._header_written:
                self.graph.output_props.sample_rate = rate
                if hasattr(self.encoder, "sample_rate"):
                    self.encoder.sample_rate = rate
                self.out_stream.codecpar.sample_rate = rate
                self.out_stream.time_base = Rational(1, rate)
        if frame is not None and self.discard_until and \
                frame.pts != NOPTS and frame.time_base.valid and \
                frame.time_base.num:
            t = frame.pts * frame.time_base.num / frame.time_base.den
            nxt = t + (getattr(frame, "nb_samples", 0)
                       / max(1, getattr(frame, "sample_rate", 1))
                       if self.media == "audio" else 0)
            if nxt < self.discard_until - 1e-9:
                return                       # exact -ss: decode & drop
        from librempeg_tpu.utils.stagetimer import stage

        with stage(f"{self.media}.graph"):
            outs = self.graph.push(frame) if frame is not None else []
            if flush:
                outs += self.graph.finish()
        for f in outs:
            if self.smap.frames_limit and \
                    self.frames_done >= self.smap.frames_limit:
                self.eof = True
                return
            self.frames_done += 1
            if self._perr_check():
                return
            if self._pipelined:
                with stage(f"{self.media}.enc_dispatch"):
                    h = self.encoder.encode_async(f)
                self._pq.put((h, mux))
            else:
                with stage(f"{self.media}.enc"):
                    for pkt in self.encoder.encode(f):
                        mux.write(pkt.replace(
                            stream_index=self.out_stream.index))

    def _perr_check(self) -> bool:
        if getattr(self, "_perr", None) is not None:
            err, self._perr = self._perr, None
            raise err
        return False

    def finish(self, mux) -> None:
        if self.copy or self.eof:
            if not self.copy:
                self._join_encodes()
            return
        for frame in self.decoder.flush():
            self._through_graph(frame, mux)
        self._through_graph(None, mux, flush=True)
        self._join_encodes()
        for pkt in self.encoder.flush():
            mux.write(pkt.replace(stream_index=self.out_stream.index))


def _map_matches(maps, st, media_index: int) -> bool:
    """-map selector subset: '0', '0:v', '0:a', '0:N', '0:v:N'
    (single-input; the leading file index must be 0)."""
    media_char = {"video": "v", "audio": "a", "subtitle": "s"}.get(
        st.codecpar.codec_type, "d")
    for m in maps:
        parts = str(m).split(":")
        if parts[0] != "0":
            continue
        if len(parts) == 1:
            return True
        if parts[1].isdigit():
            if int(parts[1]) == st.index:
                return True
        elif parts[1] == media_char:
            if len(parts) == 2 or (parts[2].isdigit()
                                   and int(parts[2]) == media_index):
                return True
    return False


class _SubtitleChain:
    """Text subtitle recode: decode cues (subrip/ass), re-encode as
    SubRip payloads for the output muxer (the srt extraction path)."""

    copy = False
    eof = False

    def __init__(self, in_stream, out_mux):
        from librempeg_tpu.codecs.api import find_decoder, find_encoder

        self.in_stream = in_stream
        self.media = "subtitle"
        self.discard_until = 0.0
        self.frames_done = 0
        self.decoder = find_decoder(in_stream.codecpar.codec_id)(
            in_stream.codecpar)
        self.encoder = find_encoder("subrip")()
        self.out_stream = out_mux.add_stream(
            self.encoder.codec_parameters(), Rational(1, 1000))

    def send_packet(self, pkt, mux) -> None:
        for cue in self.decoder.decode(pkt):
            if not cue.text:
                continue
            t = cue.pts * cue.time_base.num / cue.time_base.den \
                if cue.pts != NOPTS and cue.time_base.valid else 0.0
            if t < self.discard_until:
                continue
            for out in self.encoder.encode(cue):
                mux.write(out.replace(
                    stream_index=self.out_stream.index))
            self.frames_done += 1

    def finish(self, mux) -> None:
        pass


class Transcoder:
    """Single input -> single output transcoder (the ffmpeg CLI's core
    path; multi-input/multi-output composition comes via multiple
    instances sharing muxers)."""

    def __init__(self, spec: TranscodeSpec):
        self.spec = spec
        if spec.mesh:
            from librempeg_tpu.parallel import product_mesh as PM

            PM.set_active_mesh(PM.make_mesh(spec.mesh))
        self.demux = open_input(spec.input_url, spec.input_format,
                                **spec.input_opts)
        self.mux = open_output(spec.output_url, spec.output_format)
        self.mux.metadata.update(spec.metadata)
        self.chains: dict[int, _StreamChain] = {}

        media_counts: dict = {}
        for st in self.demux.streams:
            media = st.codecpar.codec_type
            midx = media_counts.get(media, 0)
            media_counts[media] = midx + 1
            if spec.maps and not _map_matches(spec.maps, st, midx):
                continue
            if media not in type(self.mux).SUPPORTED_TYPES:
                continue
            if media == "video" and not spec.no_video:
                smap = spec.video or StreamMap(codec="rawvideo")
                if not smap.codec:
                    smap.codec = "rawvideo"
                self.chains[st.index] = _StreamChain(st, smap, self.mux)
            elif media == "audio" and not spec.no_audio:
                smap = spec.audio or StreamMap(codec="pcm_s16le")
                if not smap.codec:
                    smap.codec = "pcm_s16le"
                self.chains[st.index] = _StreamChain(st, smap, self.mux)
            elif media == "subtitle":
                self.chains[st.index] = _SubtitleChain(st, self.mux)
        if not self.chains:
            raise InvalidData("no streams selected for transcoding")

    def run(self, progress=None, progress_interval: float = 0.5) -> dict:
        """progress: optional callback(stats_dict) fired at most every
        progress_interval seconds from the packet loop and once at EOF
        (the -progress key=value feed's data source, ffmpeg.c:344)."""
        import time as _time

        spec = self.spec
        if spec.seek:
            # container-level seek on the first seekable stream (video
            # preferred: keyframe snapping), then exact decode-and-
            # discard up to the requested time (-ss accuracy semantics,
            # fftools/ffmpeg_demux.c + ffmpeg_dec.c roles)
            seeked = False
            order = sorted(self.demux.streams,
                           key=lambda s: s.codecpar.codec_type != "video")
            # -ss is relative to the input's start time (mpegts and
            # friends start at a nonzero pts; ffmpeg_opts.c seek math)
            start = 0.0
            for st in self.demux.streams:
                if st.start_time != NOPTS and st.time_base.valid \
                        and st.time_base.num:
                    t0 = st.start_time * st.time_base.num \
                        / st.time_base.den
                    start = t0 if start == 0.0 else min(start, t0)
            for st in order:
                try:
                    ts = int((start + spec.seek) * st.time_base.den
                             / st.time_base.num)
                    self.demux.read_seek(st.index, ts)
                    seeked = True
                    break
                except NotImplementedError:
                    continue
            del seeked  # without container seek we read from the start
            for chain in self.chains.values():
                chain.discard_until = start + spec.seek
        n_packets = 0
        t0 = _time.perf_counter()
        next_prog = t0 + progress_interval
        for pkt in self.demux.packets():
            if progress is not None and \
                    _time.perf_counter() >= next_prog:
                next_prog = _time.perf_counter() + progress_interval
                progress(self._progress_stats(n_packets, t0, False))
            chain = self.chains.get(pkt.stream_index)
            if chain is None:
                continue
            if spec.duration and pkt.pts != NOPTS and \
                    pkt.time_base.valid and pkt.time_base.num and \
                    pkt.pts * pkt.time_base.num / pkt.time_base.den \
                    >= spec.duration + spec.seek:
                chain.eof = True
                if all(c.eof for c in self.chains.values()):
                    break
                continue
            chain.send_packet(pkt, self.mux)
            n_packets += 1
            if all(c.eof for c in self.chains.values()):
                break
        for chain in self.chains.values():
            chain.eof = False
            chain.finish(self.mux)
        self.mux.close()
        self.demux.close()
        if progress is not None:
            progress(self._progress_stats(n_packets, t0, True))
        return {
            "packets": n_packets,
            "frames": {i: c.frames_done for i, c in self.chains.items()},
        }

    def _progress_stats(self, n_packets: int, t0: float,
                        done: bool) -> dict:
        """Snapshot for the -progress feed (print_report fields)."""
        import time as _time

        dt = max(_time.perf_counter() - t0, 1e-6)
        vframes = 0
        out_time = 0.0
        for c in self.chains.values():
            if getattr(c, "media", "") == "video" and not c.copy:
                vframes = c.frames_done
                fr = c.graph.output_props.frame_rate \
                    if c.graph is not None else None
                fps = (fr.num / fr.den) if fr and fr.num else 25.0
                out_time = c.frames_done / fps
                break
        else:
            for c in self.chains.values():
                if getattr(c, "media", "") == "audio" and not c.copy:
                    enc = c.encoder
                    rate = getattr(enc, "sample_rate", 0) or 48000
                    fsz = getattr(enc, "frame_size", 0) or 1024
                    out_time = c.frames_done * fsz / rate
                    break
        return {
            "frame": vframes,
            "fps": vframes / dt,
            "packets": n_packets,
            "out_time_s": out_time,
            "speed": out_time / dt,
            "done": done,
        }
