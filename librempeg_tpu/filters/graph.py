"""Filter graph: links, negotiation, scheduling, device fusion.

Analog of AVFilterGraph (/root/reference/libavfilter/avfiltergraph.c:1605
avfilter_graph_config; scheduling FSM avfilter.c:1507; endpoints
buffersrc.c/buffersink.c).

Simplifications vs the reference, by design:
* Scheduling is synchronous topological push (the reference's activate
  FSM exists to bound memory across threads; here frames are immutable
  arrays and stages are device calls, so a direct dataflow walk is
  correct and allocation-free).
* Negotiation is forward-propagating: each filter fixes its output props
  from its inputs; explicit `format`/`aformat`/`scale`/`aresample`
  filters (auto-inserted at the sink when requested) do conversions —
  the common subset of the reference's two-phase format intersection.

Device fusion: maximal chains of PURE filters are compiled into one
jitted program per input-shape signature (see filters/filter.py).
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any

from librempeg_tpu.core.errors import EndOfStream, InvalidData, TryAgain
from librempeg_tpu.core.frame import AudioFrame, VideoFrame
from librempeg_tpu.filters.filter import (
    Filter,
    SourceFilter,
    StreamProps,
    find_filter,
)

Frame = Any


@dataclass
class Link:
    src: "Node"
    src_pad: int
    dst: "Node | None" = None
    dst_pad: int = 0
    queue: deque = field(default_factory=deque)
    props: StreamProps | None = None
    eof: bool = False


class Node:
    def __init__(self, filt: Filter, name: str = ""):
        self.filter = filt
        self.name = name or filt.NAME
        self.in_links: list[Link | None] = [None] * len(filt.INPUTS)
        self.out_links: list[Link | None] = [None] * len(filt.OUTPUTS)

    def __repr__(self):
        return f"<Node {self.name}>"


class FilterGraph:
    """Build with add()/link(), or from a graph description string."""

    def __init__(self):
        self.nodes: list[Node] = []
        self._configured = False

    # -- construction -------------------------------------------------
    def add(self, name: str, args: str = "", **opts) -> Node:
        cls = find_filter(name)
        node = Node(cls(args, **opts))
        self.nodes.append(node)
        return node

    def add_instance(self, filt: Filter, name: str = "") -> Node:
        node = Node(filt, name)
        self.nodes.append(node)
        return node

    def link(self, src: Node, src_pad: int, dst: Node, dst_pad: int) -> None:
        ln = Link(src=src, src_pad=src_pad, dst=dst, dst_pad=dst_pad)
        if src.out_links[src_pad] is not None:
            raise InvalidData(f"{src}: output pad {src_pad} already linked")
        if dst.in_links[dst_pad] is not None:
            raise InvalidData(f"{dst}: input pad {dst_pad} already linked")
        src.out_links[src_pad] = ln
        dst.in_links[dst_pad] = ln

    # -- configuration ------------------------------------------------
    def _topo(self) -> list[Node]:
        order: list[Node] = []
        seen: set[int] = set()

        def visit(n: Node):
            if id(n) in seen:
                return
            seen.add(id(n))
            for ln in n.in_links:
                if ln is not None:
                    visit(ln.src)
            order.append(n)

        for n in self.nodes:
            visit(n)
        return order

    def configure(self) -> None:
        """Negotiate link properties (avfilter_graph_config analog)."""
        for n in self._topo():
            in_props = []
            for ln in n.in_links:
                if ln is None:
                    raise InvalidData(f"{n}: unconnected input pad")
                if ln.props is None:
                    raise InvalidData(f"{n}: upstream props not set")
                in_props.append(ln.props)
            outs = n.filter.configure(in_props)
            for pad, ln in enumerate(n.out_links):
                if ln is not None:
                    ln.props = outs[pad]
        self._configured = True

    # -- execution ----------------------------------------------------
    def _deliver(self, node: Node, outputs) -> None:
        for pad, frame in outputs:
            ln = node.out_links[pad]
            if ln is not None and ln.dst is not None:
                ln.queue.append(frame)

    def _ready(self, node: Node) -> bool:
        links = [ln for ln in node.in_links if ln is not None]
        if not links:
            return False
        if len(links) == 1:
            return bool(links[0].queue)
        # multi-input: need one frame on every non-EOF input
        return all(ln.queue or ln.eof for ln in links) and any(
            ln.queue for ln in links)

    def run(self) -> None:
        """Drain every runnable node (one sweep to fixpoint)."""
        if not self._configured:
            self.configure()
        progress = True
        order = self._topo()
        while progress:
            progress = False
            for node in order:
                links = [ln for ln in node.in_links if ln is not None]
                if not links:
                    continue
                if len(links) == 1:
                    while links[0].queue:
                        frame = links[0].queue.popleft()
                        self._deliver(node, node.filter.filter_frame(frame, 0))
                        progress = True
                else:
                    while self._ready(node):
                        for pad, ln in enumerate(node.in_links):
                            if ln is None:
                                continue
                            if ln.queue:
                                frame = ln.queue.popleft()
                                self._deliver(
                                    node, node.filter.filter_frame(frame, pad))
                        progress = True

    def flush(self) -> None:
        if not self._configured:
            self.configure()
        self.run()
        for node in self._topo():
            # multi-input nodes only fire in run() when EVERY pad has a
            # frame; at EOF the stragglers must still be delivered
            # (ff_framesync's eof drain) or tail frames vanish.
            for pad, ln in enumerate(node.in_links):
                if ln is None:
                    continue
                while ln.queue:
                    self._deliver(node, node.filter.filter_frame(
                        ln.queue.popleft(), pad))
            self._deliver(node, node.filter.flush())
            self.run()

    def pump_sources(self) -> bool:
        """Request one frame from every in-graph source filter (sine,
        testsrc2, ...). Returns False when all sources hit EOF."""
        if not self._configured:
            self.configure()
        got = False
        for node in self.nodes:
            f = node.filter
            if isinstance(f, SourceFilter) and not isinstance(
                    f, BufferSource) and not getattr(node, "src_eof", False):
                try:
                    frame = f.request_frame()
                except EndOfStream:
                    node.src_eof = True
                    continue
                ln = node.out_links[0]
                if ln is not None:
                    ln.queue.append(frame)
                got = True
        self.run()
        return got


class BufferSource(SourceFilter):
    """App -> graph frame injection (buffersrc.c analog)."""

    NAME = "buffer"
    OUTPUTS = (None,)

    def __init__(self, props: StreamProps):
        Filter.__init__(self)
        self._props = props
        from librempeg_tpu.filters.filter import PadDesc

        self.OUTPUTS = (PadDesc("default", props.media),)
        self.out_props = [props]

    def configure(self, in_props):
        self.out_props = [self._props]
        return self.out_props


class BufferSink(Filter):
    """Graph -> app frame extraction (buffersink.c analog)."""

    NAME = "buffersink"
    OUTPUTS = ()

    def __init__(self, media: str = "video"):
        Filter.__init__(self)
        from librempeg_tpu.filters.filter import PadDesc

        self.INPUTS = (PadDesc("default", media),)
        self.frames: deque = deque()

    def configure(self, in_props):
        self.in_props = in_props
        self.out_props = []
        return []

    def filter_frame(self, frame, pad=0):
        self.frames.append(frame)
        return []

    @property
    def props(self) -> StreamProps:
        return self.in_props[0]


class GraphRunner:
    """Convenience wrapper: one input chain -> one output.

    graph = GraphRunner("scale=320:240,format=rgb24", src_props)
    for out in graph.push(frame): ...
    for out in graph.finish(): ...
    """

    def __init__(self, description: str, src_props: StreamProps | list,
                 sink_media: str | None = None):
        from librempeg_tpu.filters.parser import build_graph

        if isinstance(src_props, StreamProps):
            src_props = [src_props]
        self.graph = FilterGraph()
        self.sources = [self.graph.add_instance(BufferSource(p), f"in{i}")
                        for i, p in enumerate(src_props)]
        (self.entry_nodes, self.exit_node, self.exit_pad) = build_graph(
            self.graph, description, self.sources)
        media = sink_media or (
            self.exit_node.filter.OUTPUTS[self.exit_pad].media
            if self.exit_node.filter.OUTPUTS else src_props[0].media)
        self.sink = BufferSink(media)
        sink_node = self.graph.add_instance(self.sink, "out")
        self.graph.link(self.exit_node, self.exit_pad, sink_node, 0)
        self.graph.configure()

    @property
    def output_props(self) -> StreamProps:
        return self.sink.props

    def push(self, frame: Frame, input_index: int = 0) -> list[Frame]:
        src = self.sources[input_index]
        ln = src.out_links[0]
        ln.queue.append(frame)
        self.graph.run()
        out = list(self.sink.frames)
        self.sink.frames.clear()
        return out

    def finish(self) -> list[Frame]:
        self.graph.flush()
        out = list(self.sink.frames)
        self.sink.frames.clear()
        return out
