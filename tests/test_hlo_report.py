"""Smoke test for tools/hlo_report.py — the compiler-side attribution
artifact (SURVEY §5.1 substitute on profiler-less rigs) must keep producing
a parseable JSON with the core fields on a tiny config."""

import json
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "hlo_report.py")

TINY = ("h_size=8,z_size=2,num_blocks=2,depth=1,depth_ar=1,"
        "ar_hidden_size=8,batch_size=8,image_size=8,eval_batch_size=4,"
        "eval_k_chunk=2")


def test_hlo_report_smoke():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, TOOL, "--cpu", "--eval", "--hpconfig", TINY],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    ts = rec["train_step"]
    assert ts["xla_flops"] > 0 and ts["instructions"] > 0
    assert ts["fusions"] > 0 and ts["convolutions"] > 0
    # the multi-device CPU mesh (conftest forces 8) inserts the DP
    # grad allreduce — the collective count must see it
    if rec["devices"] > 1:
        assert ts["collectives"] > 0, ts
    (ek,) = [k for k in rec if k.startswith("eval_step_k")]
    assert rec[ek]["xla_flops"] > ts["xla_flops"] * 0  # present + numeric
    # ratio is only calibrated for paper-scale shapes (0.874 there); on a
    # tiny config the analytic model's padding assumptions overestimate —
    # just require the field to be present and positive
    assert rec.get("xla_vs_analytic_flops", 0) > 0
