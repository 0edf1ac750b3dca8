#!/usr/bin/env python
"""Dependency-free xplane.pb trace summarizer (SURVEY.md §5.1 tooling).

``jax.profiler`` writes xprof's XSpace protobuf
(``plugins/profile/<run>/*.xplane.pb``); reading it normally requires
tensorflow/xprof, neither of which exists in this image. This tool walks
the protobuf wire format directly against the XSpace schema
(tensorflow/core/profiler/protobuf/xplane.proto field numbers) and prints,
per plane and line, total/self event durations aggregated by event name —
i.e. the attribution table the xprof UI would show, on any rig.

Usage:
    python tools/xplane_summary.py TRACE.xplane.pb [--plane SUBSTR] [-k N]

Field numbers used (xplane.proto):
    XSpace.planes=1
    XPlane: id=1 name=2 lines=3 event_metadata=4 stat_metadata=5
    XLine:  id=1 name=2 timestamp_ns=3 events=4 display_id=10
            display_name=11
    XEvent: metadata_id=1 offset_ps=2 duration_ps=3 stats=4
    XEventMetadata: id=1 name=2 display_name=3
    (map<int64, XEventMetadata> entries are key=1, value=2)
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError(f"truncated varint at byte {i}")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) for one message's bytes.

    value is an int for varint/fixed fields and a memoryview for
    length-delimited fields.
    """
    i, n = 0, len(buf)
    mv = memoryview(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            if i + 8 > n:
                raise ValueError(f"truncated fixed64 at byte {i}")
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError(
                    f"truncated message: field {field} declares {ln} bytes "
                    f"at offset {i} but only {n - i} remain")
            val = mv[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            if i + 4 > n:
                raise ValueError(f"truncated fixed32 at byte {i}")
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at byte {i}")
        yield field, wt, val


# ---------------------------------------------------------------------------
# XSpace walking
# ---------------------------------------------------------------------------

def _parse_event_metadata(buf) -> tuple[int, str]:
    mid, name, display = 0, "", ""
    for f, _, v in iter_fields(bytes(buf)):
        if f == 1:
            mid = v
        elif f == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 3:
            display = bytes(v).decode("utf-8", "replace")
    return mid, (display or name)


def _parse_event(buf) -> tuple[int, int, int]:
    """Returns (metadata_id, offset_ps, duration_ps)."""
    mid = off = dur = 0
    for f, _, v in iter_fields(bytes(buf)):
        if f == 1:
            mid = v
        elif f == 2:
            off = v
        elif f == 3:
            dur = v
    return mid, off, dur


class LineSummary:
    __slots__ = ("name", "events", "total_ps", "self_ps", "count")

    def __init__(self, name: str):
        self.name = name
        self.events = []  # (offset_ps, duration_ps, metadata_id)
        self.total_ps = collections.Counter()
        self.self_ps = collections.Counter()
        self.count = collections.Counter()

    def finalize(self):
        """Compute per-name total and SELF time (total minus time covered
        by nested child events) via an interval sweep: events on one line
        nest in xprof's trace model, so a stack sweep over start-sorted
        events attributes each ps to the innermost event. Robustness
        against real traces: child time credited to a parent is CLIPPED to
        the overlap with that parent (async host events can overlap
        without nesting), and self time is floored at 0 so malformed
        overlap can never produce negative attribution."""
        # sort by offset; at equal offsets the LONGER (parent) event first
        evs = sorted(self.events, key=lambda e: (e[0], -e[1]))
        stack = []  # (end_ps, metadata_id, event index)
        child = [0] * len(evs)
        order = []
        for idx, (off, dur, mid) in enumerate(evs):
            end = off + dur
            while stack and stack[-1][0] <= off:
                stack.pop()
            if stack:
                p_end, _, p_idx = stack[-1]
                child[p_idx] += max(0, min(end, p_end) - off)
            self.total_ps[mid] += dur
            self.count[mid] += 1
            order.append((mid, dur, idx))
            stack.append((end, mid, idx))
        for mid, dur, idx in order:
            self.self_ps[mid] += max(0, dur - child[idx])


def parse_xspace(path: str):
    """Returns a list of (plane_name, lines, meta) triples — one per XPlane
    in file order (plane names may repeat in merged multi-host captures);
    ``lines`` is a list of LineSummary, ``meta`` maps metadata_id -> name."""
    data = open(path, "rb").read()
    planes = []
    for f, _, v in iter_fields(data):
        if f != 1:
            continue
        meta = {}
        lines = []
        plane_name = ""
        raw_lines = []
        for pf, _, pv in iter_fields(bytes(v)):
            if pf == 2:
                plane_name = bytes(pv).decode("utf-8", "replace")
            elif pf == 3:
                raw_lines.append(pv)
            elif pf == 4:  # map entry: key=1, value=2 (XEventMetadata)
                map_key = None
                mid, name = None, ""
                for mf, _, mval in iter_fields(bytes(pv)):
                    if mf == 1:
                        map_key = mval
                    elif mf == 2:
                        mid, name = _parse_event_metadata(mval)
                # proto3 writers may elide XEventMetadata.id (default 0)
                # and rely on the map key alone
                if not mid and map_key is not None:
                    mid = map_key
                if mid is not None:
                    meta[mid] = name
        for lv in raw_lines:
            lname = ""
            summary = None
            evs = []
            for lf, wt, lval in iter_fields(bytes(lv)):
                if lf in (2, 11) and wt == 2 and not lname:
                    lname = bytes(lval).decode("utf-8", "replace")
                elif lf == 4 and wt == 2:
                    evs.append(_parse_event(lval))
            summary = LineSummary(lname or "<unnamed>")
            summary.events = [(off, dur, mid) for mid, off, dur in evs]
            summary.finalize()
            lines.append(summary)
        planes.append((plane_name, lines, meta))
    return planes


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def summarize(path: str, plane_filter: str = "", top_k: int = 15,
              out=sys.stdout) -> None:
    planes = parse_xspace(path)
    for pname, lines, meta in planes:
        if plane_filter and plane_filter not in pname:
            continue
        print(f"\n=== plane {pname!r} ===", file=out)
        for s in lines:
            if not s.events:
                continue
            total_all = sum(s.self_ps.values())
            print(f"--- line {s.name!r}: {len(s.events)} events, "
                  f"{total_all / 1e6:.3f} us self total ---", file=out)
            rows = sorted(s.self_ps.items(), key=lambda kv: -kv[1])[:top_k]
            for mid, self_ps in rows:
                name = meta.get(mid, f"<meta {mid}>")
                print(f"  {self_ps / 1e6:12.3f} us self "
                      f"{s.total_ps[mid] / 1e6:12.3f} us total "
                      f"x{s.count[mid]:<6d} {name[:90]}", file=out)


# Category buckets for --agg (first match wins, tested top to bottom):
# the cross-check axis against tools/decompose_bench.py's ablation deltas
# (SURVEY §5.1 capture -> attribution loop).
AGG_BUCKETS = (
    ("optimizer (adamax_polyak_fused)", ("adamax_polyak_fused",)),
    ("pallas ar/iaf/likelihood", ("ar_stack_fused", "iaf_update_fused",
                                  "disc_logistic_fused")),
    ("collectives", ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute")),
    ("stacked-param slice/scatter", ("pad_add_fusion",
                                     "slice_bitcast_fusion")),
    ("async DMA waits (copy-start/done)", ("copy-start", "copy-done")),
    ("layout copies", ("%copy", "copy.")),
    # r5 HLO audit: multiply_reduce_fusion ops are mostly kOutput fusions
    # ROOTED AT the backward dx convolutions (bf16 MXU work), with the
    # elu-VJP tail + bias-grad reduce fused in — NOT pure reductions. The
    # small remainder is the weight-norm V-norm reductions.
    ("bwd-conv+reduce fusions (dx convs, elu-VJP, WN/bias grads)",
     ("multiply_reduce_fusion", "reduce_fusion")),
    # the TPU conv emitter runs inside generic %fusion.N ops, so this
    # bucket is dominated by conv fwd/bwd compute plus fused elementwise
    ("fused compute (convs + elementwise)", ("fusion", "convolution")),
)


def aggregate(path: str, out=None) -> None:
    """Bucket the device plane's per-op self time by op category and print
    ms/step — comparable directly against decompose_bench's ablation
    deltas."""
    out = out or sys.stdout  # resolve at call time (testable via capsys)
    planes = parse_xspace(path)
    for pname, lines, meta in planes:
        if "/device:" not in pname:
            continue
        steps = 0
        for s in lines:
            if s.name == "XLA Modules":
                for mid, c in s.count.items():
                    if "jit_step" in meta.get(mid, ""):
                        steps += c
        for s in lines:
            if s.name != "XLA Ops" or not s.events:
                continue
            buckets = collections.Counter()
            for mid, self_ps in s.self_ps.items():
                # bucket on the op NAME only (before " = "): the rest of
                # the instruction text contains OPERAND names, which would
                # misbucket e.g. a fusion consuming %copy.N as a copy
                name = meta.get(mid, "").split(" = ")[0]
                op_kind = ""
                m = meta.get(mid, "")
                if " = " in m:  # "… = f32[...] OPKIND(...)" — the op kind
                    rhs = m.split(" = ", 1)[1]
                    paren = rhs.find("(")
                    if paren > 0:
                        op_kind = rhs[:paren].rsplit(" ", 1)[-1]
                for label, pats in AGG_BUCKETS:
                    if any(p in name or p == op_kind for p in pats):
                        buckets[label] += self_ps
                        break
                else:
                    buckets["other"] += self_ps
            total = sum(buckets.values())
            denom = max(steps, 1)
            print(f"\n=== plane {pname!r}: XLA Ops self-time by category "
                  f"({steps} jit_step executions) ===", file=out)
            for label, ps in buckets.most_common():
                print(f"  {ps / 1e9 / denom:8.3f} ms/step "
                      f"({100 * ps / total:5.1f}%)  {label}", file=out)
            print(f"  {total / 1e9 / denom:8.3f} ms/step (100.0%)  "
                  "TOTAL device op self-time", file=out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="xplane.pb file, or a profile dir to "
                    "search for the newest one")
    ap.add_argument("--plane", default="", help="only planes whose name "
                    "contains this substring")
    ap.add_argument("-k", "--top_k", type=int, default=15)
    ap.add_argument("--agg", action="store_true",
                    help="aggregate device-plane op self-time by category "
                    "(ms/step) instead of the per-op table")
    args = ap.parse_args()
    path = args.path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True), key=os.path.getmtime)
        if not cands:
            sys.exit(f"no *.xplane.pb under {path}")
        path = cands[-1]
        print(f"[xplane_summary] {path}")
    if args.agg:
        aggregate(path)
    else:
        summarize(path, args.plane, args.top_k)


if __name__ == "__main__":
    main()
