"""Profiler-trace plumbing regression (SURVEY.md §5.1).

The tunneled axon TPU offers no profiler service, so TPU traces cannot be
captured on this rig (PARITY.md "Known gaps"); the plumbing itself —
``jax.profiler`` around the real train loop, with ``jax.named_scope``
annotations inside the jitted step — must keep working so a
directly-attached TPU gets attributable traces with zero code change.

This test captures a real trace through the same path ``train.py
--profile_dir`` drives (``iaf_tpu/cli.py``) and asserts the
xprof-readable xplane contains our scope names. It runs in a SUBPROCESS
on a single CPU device: under the suite's 8-virtual-device mesh the SPMD
partitioner rewrites op names and drops the scope metadata from the
xplane (an XLA property, verified empirically), while the 1-device case —
which is what each host of a real TPU pod looks like to the profiler —
retains them.
"""

import glob
import os
import subprocess
import sys

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
trace_dir, logdir = sys.argv[1], sys.argv[2]
# Drive the REAL CLI path (train.py == iaf_tpu.cli.main), including its
# --profile_dir wiring (backend allowlist + start/stop_trace in finally).
sys.argv = [
    "train.py", "--logdir", logdir, "--profile_dir", trace_dir,
    "--mode", "train", "--hpconfig",
    "dataset=synthetic,image_size=8,channels=3,z_size=2,h_size=8,depth=1,"
    "num_blocks=1,depth_ar=1,ar_hidden_size=8,kl_min=0.25,"
    "learning_rate=0.005,batch_size=8,total_steps=4,ckpt_every=4,"
    "log_every=4"]
from iaf_tpu.cli import main
main()
"""


def test_trace_capture_contains_named_scopes(tmp_path):
    trace_dir = tmp_path / "trace"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # single device: drop the suite's 8-virtual-device flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(trace_dir),
         str(tmp_path / "logdir")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=480)
    assert proc.returncode == 0, proc.stderr[-2000:]

    pbs = glob.glob(str(trace_dir / "**" / "*.xplane.pb"), recursive=True)
    assert pbs, "no xplane.pb written by jax.profiler"
    data = open(pbs[0], "rb").read()
    assert len(data) > 1_000_000, "trace suspiciously small"
    # The named_scope annotations (model layers, optimizer) must survive
    # into the trace so xprof attribution works (SURVEY §5.1).
    for scope in (b"iaf_up", b"iaf_down", b"ar_stack", b"adamax"):
        assert data.count(scope) > 0, f"scope {scope!r} missing from trace"

    # The dependency-free summarizer must turn the trace into a non-empty
    # attribution table (tools/xplane_summary.py — the xprof substitute on
    # rigs without tensorflow).
    sys.path.insert(0, os.path.join(repo, "tools"))
    from xplane_summary import parse_xspace
    planes = parse_xspace(pbs[0])
    assert planes, "no planes parsed"
    n_events = 0
    for _, lines, meta in planes:
        for s in lines:
            n_events += len(s.events)
            for mid, self_ps in s.self_ps.items():
                assert 0 <= self_ps <= s.total_ps[mid]
    assert n_events > 100, f"suspiciously few events parsed: {n_events}"
