"""ffmpeg-compatible CLI.

Analog of /root/reference/fftools/ffmpeg.c + ffmpeg_opt.c option
grammar: the common subset (`-i`, per-stream `-c:v/-c:a`, `-vf/-af`,
`-s`, `-r`, `-pix_fmt`, `-ar`, `-ac`, `-ss`, `-t`, `-frames:v`, `-q:v`,
`-f`, `-an/-vn`, `-y`) mapped onto the sched.pipeline Transcoder.

Usage: python -m librempeg_tpu.cli.ffmpeg [options] -i input [options] output
"""
from __future__ import annotations

import os
import sys
import time

from librempeg_tpu.core.log import Logger, set_level
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.sched.pipeline import StreamMap, Transcoder, TranscodeSpec

log = Logger("ffmpeg")


def _parse_time(s: str) -> float:
    """'12.5' or 'HH:MM:SS.mmm'."""
    if ":" in s:
        parts = s.split(":")
        t = 0.0
        for p in parts:
            t = t * 60 + float(p)
        return t
    return float(s)


class CliError(SystemExit):
    pass


def parse_args(argv: list[str]) -> tuple[TranscodeSpec, dict]:
    spec_kw: dict = {"input_url": None, "output_url": None}
    in_opts: dict = {}
    glob: dict = {"overwrite": False, "benchmark": False, "threads": 0,
                  "progress": "", "stats_period": 0.5}
    video = StreamMap()
    audio = StreamMap()
    pre_input = True
    pending_fmt = None

    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i_ = i + 1
            if i_ >= len(argv):
                raise CliError(f"option {a} needs an argument")
            i += 1
            return argv[i_]

        if a == "-i":
            spec_kw["input_url"] = val()
            spec_kw["input_format"] = pending_fmt
            spec_kw["input_opts"] = dict(in_opts)
            pending_fmt = None
            in_opts.clear()
            pre_input = False
        elif a == "-f":
            pending_fmt = val()
        elif a == "-y":
            glob["overwrite"] = True
        elif a == "-n":
            glob["overwrite"] = False
        elif a in ("-v", "-loglevel"):
            set_level(val())
        elif a == "-benchmark":
            glob["benchmark"] = True
        elif a == "-progress":
            glob["progress"] = val()
        elif a == "-stats_period":
            glob["stats_period"] = float(val())
        elif a == "-threads":
            glob["threads"] = int(val())
        elif a in ("-s", "-video_size", "-s:v"):
            wh = val()
            w, h = wh.lower().split("x")
            if pre_input:
                in_opts["width"], in_opts["height"] = int(w), int(h)
            else:
                video.width, video.height = int(w), int(h)
        elif a in ("-r", "-framerate", "-r:v"):
            r = val()
            rate = (Rational(*map(int, r.split("/"))) if "/" in r
                    else Rational.from_float(float(r)))
            if pre_input:
                in_opts["framerate"] = rate
            else:
                video.filters = _append_filter(video.filters,
                                               f"fps={rate.num}/{rate.den}")
        elif a == "-pix_fmt":
            v = val()
            if pre_input:
                in_opts["pix_fmt"] = v
            else:
                video.pix_fmt = v
        elif a == "-ar":
            v = int(val())
            if pre_input:
                in_opts["sample_rate"] = v
            else:
                audio.sample_rate = v
        elif a in ("-ac", "-channels"):
            v = int(val())
            if pre_input:
                in_opts["channels"] = v
            else:
                audio.channels = v
        elif a == "-ch_layout":
            v = val()
            from librempeg_tpu.core.samplefmt import ChannelLayout

            ch = ChannelLayout.from_string(v).nb_channels
            if pre_input:
                in_opts["channels"] = ch
            else:
                audio.channels = ch
        elif a in ("-c", "-codec"):
            video.codec = audio.codec = val()
        elif a in ("-c:v", "-codec:v", "-vcodec"):
            video.codec = val()
        elif a in ("-c:a", "-codec:a", "-acodec"):
            audio.codec = val()
        elif a in ("-vf", "-filter:v"):
            video.filters = val()
        elif a in ("-af", "-filter:a"):
            audio.filters = val()
        elif a in ("-q:v", "-qscale:v", "-q"):
            video.codec_opts["quality_scale"] = float(val())
        elif a in ("-b:v", "-b"):
            video.codec_opts["bit_rate"] = _parse_bitrate(val())
        elif a == "-b:a":
            audio.codec_opts["bit_rate"] = _parse_bitrate(val())
        elif a in ("-frames:v", "-vframes"):
            video.frames_limit = int(val())
        elif a in ("-frames:a", "-aframes"):
            audio.frames_limit = int(val())
        elif a == "-ss":
            spec_kw["seek"] = _parse_time(val())
        elif a == "-mesh":
            # device-mesh transcode: e.g. -mesh data=2,spatial=4 runs
            # the sharded kernels (halo ME/MC, split-row scaling) over
            # a jax.sharding.Mesh
            spec_kw["mesh"] = val()
        elif a in ("-t", "-to"):
            spec_kw["duration"] = _parse_time(val())
        elif a == "-an":
            spec_kw["no_audio"] = True
        elif a == "-vn":
            spec_kw["no_video"] = True
        elif a == "-g":
            video.codec_opts["gop_size"] = int(val())
        elif a == "-bf":
            video.codec_opts["max_b_frames"] = int(val())
        elif a == "-trellis":
            video.codec_opts["trellis"] = int(val())
        elif a == "-map":
            spec_kw.setdefault("maps", []).append(val())
        elif a == "-metadata":
            kv = val()
            if "=" not in kv:
                raise CliError("-metadata needs key=value")
            k, v = kv.split("=", 1)
            spec_kw.setdefault("metadata", {})[k] = v
        elif a.startswith("-"):
            # ffmpeg semantics: unrecognized -name [value] pairs are
            # private codec/format options resolved per-stream later
            # (ffmpeg_opt.c AVDictionary passthrough); -name:v / -name:a
            # scopes the stream. Unknown names warn at bind time.
            name = a[1:]
            scope = None
            if name.endswith(":v") or name.endswith(":a"):
                name, scope = name[:-2], name[-1]
            if pre_input:
                in_opts[name] = val()
            elif scope == "a":
                audio.codec_opts[name] = val()
            elif scope == "v":
                video.codec_opts[name] = val()
            else:
                v = val()
                video.codec_opts[name] = v
                audio.codec_opts[name] = v
        else:
            spec_kw["output_url"] = a
            spec_kw["output_format"] = pending_fmt
            pending_fmt = None
        i += 1

    if spec_kw["input_url"] is None:
        raise CliError("no input specified (-i)")
    if spec_kw["output_url"] is None:
        raise CliError("no output specified")
    spec_kw["video"] = video
    spec_kw["audio"] = audio
    return TranscodeSpec(**spec_kw), glob


def _append_filter(desc: str, f: str) -> str:
    return f"{desc},{f}" if desc else f


def _parse_bitrate(s: str) -> int:
    mult = 1
    if s[-1:].lower() == "k":
        mult, s = 1000, s[:-1]
    elif s[-1:].lower() == "m":
        mult, s = 1000000, s[:-1]
    return int(float(s) * mult)


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "-help", "--help"):
        print(__doc__)
        return 0
    try:
        spec, glob = parse_args(argv)
    except CliError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if (os.path.exists(spec.output_url) and not glob["overwrite"]
            and spec.output_url != "-"
            and not spec.output_url.startswith("pipe:")):
        print(f"File '{spec.output_url}' already exists "
              f"(use -y to overwrite)", file=sys.stderr)
        return 1
    t0 = time.perf_counter()
    tc = Transcoder(spec)
    prog_cb = None
    prog_io = None
    if glob["progress"]:
        # machine-readable key=value feed (ffmpeg.c:344 -progress):
        # one block per report, terminated by progress=continue/end
        url = glob["progress"]
        if url in ("-", "pipe:", "pipe:1"):
            prog_io = sys.stdout
        else:
            prog_io = open(url, "w")

        def prog_cb(st):
            h = int(st["out_time_s"] // 3600)
            m = int(st["out_time_s"] // 60) % 60
            s = st["out_time_s"] % 60
            prog_io.write(
                f"frame={st['frame']}\n"
                f"fps={st['fps']:.2f}\n"
                f"out_time_us={int(st['out_time_s'] * 1e6)}\n"
                f"out_time={h:02d}:{m:02d}:{s:09.6f}\n"
                f"speed={st['speed']:.3g}x\n"
                f"progress={'end' if st['done'] else 'continue'}\n")
            prog_io.flush()

    stats = tc.run(progress=prog_cb,
                   progress_interval=glob["stats_period"])
    if prog_io is not None and prog_io is not sys.stdout:
        prog_io.close()
    dt = time.perf_counter() - t0
    frames = sum(stats["frames"].values())
    print(f"frames={frames} packets={stats['packets']} "
          f"time={dt:.2f}s"
          + (f" fps={frames / dt:.1f}" if frames else ""),
          file=sys.stderr)
    if glob["benchmark"]:
        import resource

        ru = resource.getrusage(resource.RUSAGE_SELF)
        print(f"bench: utime={ru.ru_utime:.3f}s stime={ru.ru_stime:.3f}s "
              f"rtime={dt:.3f}s", file=sys.stderr)
        print(f"bench: maxrss={ru.ru_maxrss}KiB", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
