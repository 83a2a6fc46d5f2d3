"""Pipeline checkpoint/resume.

SURVEY.md §5 notes the reference has no training-style checkpoints —
its domain equivalents are precise seeking and segment-finalizing
muxers. This module adds the real thing the TPU build was asked for:
snapshot a running Transcoder's state (demux byte position, per-chain
codec/filter state, muxer interleave queue) and resume later, so long
transcodes survive preemption (the production-serving failure model).

State is pickled; device arrays are pulled to host numpy first.
"""
from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np


def _to_host(obj: Any) -> Any:
    """Recursively convert jax arrays to numpy for pickling."""
    import jax

    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, tuple):
        return tuple(_to_host(o) for o in obj)
    if isinstance(obj, list):
        return [_to_host(o) for o in obj]
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    return obj


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
                    enc_state[attr] = _to_host(getattr(enc, attr))
            state["encoder"] = enc_state
        if chain.graph is not None:
            # resampler carry inside aresample filters
            rs_states = []
            for node in chain.graph.graph.nodes:
                swr = getattr(node.filter, "_swr", None)
                if swr is not None and swr.resampler is not None:
                    r = swr.resampler
                    rs_states.append({
                        "_hist": r._hist, "_out_count": r._out_count,
                        "_total_in": getattr(r, "_total_in", 0)})
                else:
                    rs_states.append(None)
            state["resamplers"] = rs_states
        chains[idx] = state
    # demuxer scalar state (packet counters, data-chunk offsets, ...)
    demux_attrs = {k: v for k, v in vars(tc.demux).items()
                   if isinstance(v, (int, float, bool))}
    return pickle.dumps({
        "demux_pos": tc.demux.io.tell(),
        "demux_attrs": demux_attrs,
        "chains": chains,
    })


def restore(tc, blob: bytes) -> None:
    """Restore a snapshot into a freshly constructed Transcoder with the
    same spec (mirrors orbax-style restore-into-abstract-state)."""
    state = pickle.loads(blob)
    tc.demux.io.seek(state["demux_pos"])
    for k, v in state.get("demux_attrs", {}).items():
        setattr(tc.demux, k, v)
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
                    for attr, val in rs.items():
                        setattr(swr.resampler, attr, val)
