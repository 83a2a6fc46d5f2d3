"""Pipeline checkpoint/resume.

SURVEY.md §5 notes the reference has no training-style checkpoints —
its domain equivalents are precise seeking and segment-finalizing
muxers. This module adds the real thing the TPU build was asked for:
snapshot a running Transcoder's state (demux byte position, per-chain
codec/filter state, muxer interleave queue) and resume later, so long
transcodes survive preemption (the production-serving failure model).

Serialization is a data-only format (JSON scalar tree + npz array
bundle) so restoring an untrusted/tampered snapshot can never execute
code — unlike pickle.
"""
from __future__ import annotations

import io
import json
import struct
from typing import Any

import numpy as np

_MAGIC = b"LTCKPT1\n"


def _encode(obj: Any, arrays: list) -> Any:
    """Lower a state tree to a JSON-safe tree; ndarrays go to `arrays`."""
    import jax

    if obj is None or isinstance(obj, (bool, str)):
        return obj
    if isinstance(obj, (int, np.integer)):
        return int(obj)
    if isinstance(obj, (float, np.floating)):
        return float(obj)
    if isinstance(obj, (np.ndarray, jax.Array)):
        arrays.append(np.asarray(obj))
        return {"__nd__": len(arrays) - 1}
    if isinstance(obj, tuple):
        return {"__tup__": [_encode(o, arrays) for o in obj]}
    if isinstance(obj, list):
        return [_encode(o, arrays) for o in obj]
    if isinstance(obj, dict):
        return {"__map__": [[_encode(k, arrays), _encode(v, arrays)]
                            for k, v in obj.items()]}
    if isinstance(obj, bytes):
        arrays.append(np.frombuffer(obj, np.uint8))
        return {"__bytes__": len(arrays) - 1}
    raise TypeError(f"checkpoint: unsupported state type {type(obj)!r}")


def _decode(obj: Any, arrays: dict) -> Any:
    if isinstance(obj, list):
        return [_decode(o, arrays) for o in obj]
    if isinstance(obj, dict):
        if "__nd__" in obj:
            return arrays[f"a{obj['__nd__']}"]
        if "__bytes__" in obj:
            return arrays[f"a{obj['__bytes__']}"].tobytes()
        if "__tup__" in obj:
            return tuple(_decode(o, arrays) for o in obj["__tup__"])
        if "__map__" in obj:
            return {_decode(k, arrays): _decode(v, arrays)
                    for k, v in obj["__map__"]}
        raise ValueError("checkpoint: malformed node")
    return obj


def dumps_state(state: Any) -> bytes:
    arrays: list = []
    tree = json.dumps(_encode(state, arrays)).encode()
    buf = io.BytesIO()
    np.savez(buf, **{f"a{i}": a for i, a in enumerate(arrays)})
    return _MAGIC + struct.pack("<Q", len(tree)) + tree + buf.getvalue()


def loads_state(blob: bytes) -> Any:
    if blob[:len(_MAGIC)] != _MAGIC:
        raise ValueError("checkpoint: bad magic (not a LTCKPT1 snapshot)")
    off = len(_MAGIC)
    (tlen,) = struct.unpack_from("<Q", blob, off)
    off += 8
    tree = json.loads(blob[off:off + tlen].decode())
    arrays: dict = {}
    npz_bytes = blob[off + tlen:]
    if npz_bytes:
        with np.load(io.BytesIO(npz_bytes), allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
    return _decode(tree, arrays)


def snapshot(tc) -> bytes:
    """Capture a resumable snapshot of a Transcoder between packets."""
    chains = {}
    for idx, chain in tc.chains.items():
        enc = chain.encoder
        state: dict[str, Any] = {"frames_done": chain.frames_done}
        if enc is not None:
            enc_state = {}
            for attr in ("_ref", "_frame_idx", "_next_pts", "_frame_no",
                         "_pend", "_hist", "_total", "_total_in"):
                if hasattr(enc, attr):
                    enc_state[attr] = getattr(enc, attr)
            state["encoder"] = enc_state
        if chain.graph is not None:
            # resampler carry inside aresample filters
            rs_states = []
            for node in chain.graph.graph.nodes:
                swr = getattr(node.filter, "_swr", None)
                if swr is not None and swr.resampler is not None:
                    r = swr.resampler
                    rs = {a: getattr(r, a) for a in
                          ("_buf", "_buf_start", "_next_origin",
                           "_out_count", "_total_in", "_keep")}
                    if r._comp is not None:
                        # bank matrix is rebuilt on restore from its
                        # rational (data-only snapshot format)
                        rs["_comp_pqr"] = (r._comp["p"], r._comp["q"],
                                           r._comp["remaining"])
                    rs_states.append(rs)
                else:
                    rs_states.append(None)
            state["resamplers"] = rs_states
        chains[idx] = state
    # demuxer scalar state (packet counters, data-chunk offsets, ...)
    demux_attrs = {k: v for k, v in vars(tc.demux).items()
                   if isinstance(v, (int, float, bool))}
    return dumps_state({
        "demux_pos": tc.demux.tell_resume(),
        "demux_attrs": demux_attrs,
        "chains": chains,
    })


def restore(tc, blob: bytes) -> None:
    """Restore a snapshot into a freshly constructed Transcoder with the
    same spec (mirrors orbax-style restore-into-abstract-state).

    Snapshots are a data-only format; no code is executed on load."""
    state = loads_state(blob)
    tc.demux.io.seek(state["demux_pos"])
    for k, v in state.get("demux_attrs", {}).items():
        setattr(tc.demux, k, v)
    tc.demux.on_restore()  # drop read-ahead so reading resumes at the seek
    for idx, chst in state["chains"].items():
        chain = tc.chains.get(idx)
        if chain is None:
            continue
        chain.frames_done = chst["frames_done"]
        if "encoder" in chst and chain.encoder is not None:
            for attr, val in chst["encoder"].items():
                setattr(chain.encoder, attr, val)
        if "resamplers" in chst and chain.graph is not None:
            nodes = chain.graph.graph.nodes
            for node, rs in zip(nodes, chst["resamplers"]):
                if rs is None:
                    continue
                swr = getattr(node.filter, "_swr", None)
                if swr is not None and swr.resampler is not None:
                    r = swr.resampler
                    pqr = rs.pop("_comp_pqr", None)
                    for attr, val in rs.items():
                        setattr(r, attr, val)
                    r._comp = None
                    if pqr is not None:
                        from librempeg_tpu.resample.resampler import (
                            _bank_matrix,
                        )
                        import jax.numpy as jnp

                        p2, q2, rem = pqr
                        m2, L2, lp2 = _bank_matrix(
                            p2, q2, r.taps, int(r._cutoff * 1e6),
                            int(r.opts["kaiser_beta"] * 10),
                            r.opts["window"])
                        r._comp = {"m": jnp.asarray(m2), "p": p2,
                                   "q": q2, "L": L2, "lp": lp2,
                                   "remaining": rem}
