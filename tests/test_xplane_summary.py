"""tools/xplane_summary.py — dependency-free xplane.pb parsing.

The wire-format walker is tested against a hand-encoded XSpace protobuf
(exact expected values, including nested self-time attribution); the
real-trace integration lives in test_profiler_trace.py.
"""

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from xplane_summary import parse_xspace, summarize  # noqa: E402


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wt: int, payload: bytes) -> bytes:
    key = _varint((num << 3) | wt)
    if wt == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _msg(num: int, payload: bytes) -> bytes:
    return _field(num, 2, payload)


def _build_space() -> bytes:
    # XEventMetadata {id=1, name=2}
    meta1 = _field(1, 0, _varint(7)) + _field(2, 2, b"matmul")
    meta2 = _field(1, 0, _varint(8)) + _field(2, 2, b"relu")
    # map entries {key=1, value=2}
    me1 = _field(1, 0, _varint(7)) + _msg(2, meta1)
    me2 = _field(1, 0, _varint(8)) + _msg(2, meta2)

    def event(mid, off, dur):
        return (_field(1, 0, _varint(mid)) + _field(2, 0, _varint(off))
                + _field(3, 0, _varint(dur)))

    # matmul [0, 100) with a nested relu [10, 40): matmul self = 70
    line = (_field(1, 0, _varint(1)) + _field(2, 2, b"XLA Ops")
            + _msg(4, event(7, 0, 100)) + _msg(4, event(8, 10, 30)))
    plane = (_field(2, 2, b"/device:TPU:0") + _msg(3, line)
             + _msg(4, me1) + _msg(4, me2))
    return _msg(1, plane)


def test_parse_hand_encoded_xspace(tmp_path):
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(_build_space())
    ((pname, lines, meta),) = parse_xspace(str(p))
    assert pname == "/device:TPU:0"
    assert meta == {7: "matmul", 8: "relu"}
    (s,) = lines
    assert s.name == "XLA Ops"
    assert s.total_ps[7] == 100 and s.total_ps[8] == 30
    assert s.self_ps[7] == 70 and s.self_ps[8] == 30  # nesting attributed
    assert s.count[7] == 1 and s.count[8] == 1

    out = io.StringIO()
    summarize(str(p), top_k=5, out=out)
    text = out.getvalue()
    assert "matmul" in text and "relu" in text and "XLA Ops" in text


def test_overlapping_events_never_go_negative():
    """Async host events can overlap without nesting ([0,50) vs [10,70));
    attribution clips child time to the overlap and floors self at 0."""
    from xplane_summary import LineSummary
    s = LineSummary("host")
    s.events = [(0, 50, 1), (10, 60, 2)]
    s.finalize()
    assert s.self_ps[1] == 10  # 50 - overlap 40
    assert s.self_ps[2] == 60
    assert all(v >= 0 for v in s.self_ps.values())


def test_agg_buckets_by_op_name_not_operands(tmp_path, capsys):
    """--agg buckets on the op NAME before ' = ': a fusion consuming a
    %copy operand must land in fused compute, not layout copies; the named
    optimizer kernel gets its own bucket; ms/step divides by the jit_step
    count on the XLA Modules line."""
    from xplane_summary import aggregate

    names = {
        11: "%adamax_polyak_fused.1 = (f32[8,8]) custom-call(f32[8,8] %p)",
        12: "%fusion.7 = f32[8,8] fusion(f32[8,8] %copy.3), kind=kOutput",
        13: "%copy.3 = f32[8,8] copy(f32[8,8] %arg0)",
        14: "jit_step(123)",
    }
    metas = b"".join(
        _msg(4, _field(1, 0, _varint(mid))
             + _msg(2, _field(1, 0, _varint(mid))
                    + _field(2, 2, n.encode())))
        for mid, n in names.items())

    def event(mid, off, dur):
        return (_field(1, 0, _varint(mid)) + _field(2, 0, _varint(off))
                + _field(3, 0, _varint(dur)))

    # 2 jit_step executions; disjoint ops: kernel 4e9ps, fusion 6e9, copy 2e9
    ops = (_field(2, 2, b"XLA Ops")
           + _msg(4, event(11, 0, 4_000_000_000))
           + _msg(4, event(12, 5_000_000_000, 6_000_000_000))
           + _msg(4, event(13, 12_000_000_000, 2_000_000_000)))
    mods = (_field(2, 2, b"XLA Modules")
            + _msg(4, event(14, 0, 1)) + _msg(4, event(14, 10, 1)))
    plane = (_field(2, 2, b"/device:TPU:0") + _msg(3, ops) + _msg(3, mods)
             + metas)
    p = tmp_path / "agg.xplane.pb"
    p.write_bytes(_msg(1, plane))
    aggregate(str(p))
    out = capsys.readouterr().out
    assert "2 jit_step executions" in out
    # 4e9 ps over 2 steps = 2 ms/step for the optimizer kernel
    assert "2.000 ms/step" in out and "optimizer (adamax_polyak_fused)" in out
    # fusion(… %copy.3 …) goes to fused compute (3 ms/step), not copies
    assert "3.000 ms/step" in out
    copies_line = [l for l in out.splitlines() if "layout copies" in l]
    assert copies_line and "1.000 ms/step" in copies_line[0]


def test_truncated_file_raises(tmp_path):
    import pytest
    buf = _build_space()
    p = tmp_path / "trunc.xplane.pb"
    p.write_bytes(buf[: len(buf) - 5])
    with pytest.raises(ValueError, match="truncated"):
        parse_xspace(str(p))


def test_map_key_used_when_metadata_id_elided(tmp_path):
    """proto3 writers may rely on the map key and elide XEventMetadata.id
    (default 0): the parser must fall back to the map entry key."""
    meta_no_id = _field(2, 2, b"fusion")  # XEventMetadata {name only}
    entry = _field(1, 0, _varint(9)) + _msg(2, meta_no_id)
    ev = (_field(1, 0, _varint(9)) + _field(2, 0, _varint(0))
          + _field(3, 0, _varint(10)))
    line = _field(2, 2, b"ops") + _msg(4, ev)
    plane = _field(2, 2, b"/device:TPU:0") + _msg(3, line) + _msg(4, entry)
    p = tmp_path / "m.xplane.pb"
    p.write_bytes(_msg(1, plane))
    ((_, lines, meta),) = parse_xspace(str(p))
    assert meta == {9: "fusion"}
    assert lines[0].total_ps[9] == 10
