"""Minimal XSpace/XPlane protobuf reader for per-pass device attribution.

`jax.profiler.trace` writes an `*.xplane.pb` (tsl XSpace proto) containing,
for TPU devices, an "XLA Ops" line whose events are the REAL on-chip
executions of each (fused) HLO op — duration, plus static per-op metadata:
`tf_op` (the jax name-stack path, which carries our `pass_*` named scopes,
frame.py), `flops`, `bytes_accessed`, `program_id`. This module decodes just
enough of the wire format to aggregate those (the full proto lives in
tensorflow, whose import costs ~60 s; the wire format below is stable —
tsl/profiler/protobuf/xplane.proto).

Field numbers used (xplane.proto):
  XSpace.planes = 1
  XPlane: id=1 name=2 lines=3 event_metadata=4 stat_metadata=5 stats=6
  XLine:  id=1 name=2 events=4
  XEvent: metadata_id=1 offset_ps=2 duration_ps=3 stats=4 occurrences=5
  XStat:  metadata_id=1 double=2 uint64=3 int64=4 str=5 bytes=6 ref=7
  XEventMetadata: id=1 name=2 metadata=3 display_name=4 stats=5
  XStatMetadata:  id=1 name=2 description=3
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Tuple


def _read_varint(b: bytes, i: int) -> Tuple[int, int]:
    x = 0
    s = 0
    while True:
        v = b[i]
        i += 1
        x |= (v & 0x7F) << s
        if not v & 0x80:
            return x, i
        s += 7


def _fields(b: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i = 0
    n = len(b)
    while i < n:
        tag, i = _read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 2:
            ln, i = _read_varint(b, i)
            v = b[i : i + ln]
            i += ln
        elif wt == 5:
            v = b[i : i + 4]
            i += 4
        elif wt == 1:
            v = b[i : i + 8]
            i += 8
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_stat(val: bytes, stat_names: Dict[int, str]):
    name_id = 0
    sval = None
    for fn, _wt, v in _fields(val):
        if fn == 1:
            name_id = v
        elif fn == 2:
            sval = struct.unpack("<d", v)[0]
        elif fn in (3, 4, 7):
            sval = v
        elif fn == 5:
            sval = v.decode("utf-8", "replace")
        elif fn == 6:
            sval = bytes(v)
    return stat_names.get(name_id, str(name_id)), sval


@dataclass
class OpMeta:
    name: str = ""
    display: str = ""
    stats: Dict[str, object] = field(default_factory=dict)


@dataclass
class Event:
    metadata_id: int
    duration_ps: int
    stats: Dict[str, object]


@dataclass
class Line:
    name: str
    events: List[Event]


@dataclass
class Plane:
    name: str
    lines: List[Line]
    event_metadata: Dict[int, OpMeta]


def parse_planes(path: str) -> List[Plane]:
    data = open(path, "rb").read()
    planes = []
    for fn, _wt, v in _fields(data):
        if fn != 1:
            continue
        name = ""
        raw_lines: List[bytes] = []
        raw_evmd: List[bytes] = []
        stat_names: Dict[int, str] = {}
        for f2, _w2, v2 in _fields(v):
            if f2 == 2:
                name = v2.decode()
            elif f2 == 3:
                raw_lines.append(v2)
            elif f2 == 4:
                raw_evmd.append(v2)
            elif f2 == 5:
                mv = None
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 2:
                        mv = v3
                mid, mname = 0, ""
                if mv is not None:
                    for f4, _w4, v4 in _fields(mv):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 2:
                            mname = v4.decode()
                stat_names[mid] = mname
        evmd: Dict[int, OpMeta] = {}
        for raw in raw_evmd:
            mv = None
            for f3, _w3, v3 in _fields(raw):
                if f3 == 2:
                    mv = v3
            if mv is None:
                continue
            md = OpMeta()
            mid = 0
            for f4, _w4, v4 in _fields(mv):
                if f4 == 1:
                    mid = v4
                elif f4 == 2:
                    md.name = v4.decode()
                elif f4 == 4:
                    md.display = v4.decode()
                elif f4 == 5:
                    k, sv = _parse_stat(v4, stat_names)
                    md.stats[k] = sv
            evmd[mid] = md
        lines = []
        for lv in raw_lines:
            lname = ""
            events = []
            for f3, _w3, v3 in _fields(lv):
                if f3 == 2:
                    lname = v3.decode()
                elif f3 == 4:
                    mid = 0
                    dur = 0
                    stats: Dict[str, object] = {}
                    for f4, _w4, v4 in _fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                        elif f4 == 4:
                            k, sv = _parse_stat(v4, stat_names)
                            stats[k] = sv
                    events.append(Event(mid, dur, stats))
            lines.append(Line(lname, events))
        planes.append(Plane(name, lines, evmd))
    return planes
