"""tools/long_run_report.py: the long-horizon health checks (VERDICT r1
missing #1) must pass on a healthy trajectory and fail on NaN /
KL-collapse / non-decreasing loss."""

import json
import subprocess
import sys
import os

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "long_run_report.py")


def write(tmp_path, rows):
    with open(tmp_path / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return tmp_path


def run(logdir):
    return subprocess.run([sys.executable, TOOL, str(logdir)],
                          capture_output=True, text=True)


def healthy_rows(n=20):
    return [{"step": 100 * (i + 1), "loss": 2000.0 - 50 * i,
             "bits_per_dim": 8.0 - 0.1 * i,
             "kl_per_layer": [5.0 + 0.1 * i, 4.0]} for i in range(n)]


def test_healthy_run_passes(tmp_path):
    rows = healthy_rows()
    rows.append({"step": 2000, "eval_bits_per_dim": 6.5})
    r = run(write(tmp_path, rows))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok   finiteness" in r.stdout
    assert "ok   free bits" in r.stdout
    assert "ok   progress" in r.stdout
    assert "eval trajectory" in r.stdout
    # short horizon: the EMA-crossing check does not arm below 20k steps
    assert "EMA crossing" not in r.stdout


def long_rows(n=40, eval_final=None):
    """20k+ horizon rows with evals: crossing holds at the eval minimum."""
    rows = [{"step": 500 * (i + 1), "loss": 2000.0 - 20 * i,
             "bits_per_dim": 8.0 - 0.05 * i,
             "kl_per_layer": [5.0, 4.0]} for i in range(n)]
    rows.append({"step": 10_000, "eval_bits_per_dim": 7.0})
    rows.append({"step": 15_000, "eval_bits_per_dim": 6.5})   # min; train
    # bits at 15k = 8.0 - 0.05*29 = 6.55 -> crossing holds there
    rows.append({"step": 20_000,
                 "eval_bits_per_dim": 9.0 if eval_final is None
                 else eval_final})
    return rows


def test_ema_crossing_checked_at_eval_minimum(tmp_path):
    """The 100k-soak regime: the final eval overfits way above train, but
    the crossing at the eval-minimum point passes (memorization on a tiny
    synthetic set is not a Polyak failure)."""
    r = run(write(tmp_path, long_rows()))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok   EMA crossing at its best point (step 15000)" in r.stdout
    assert "memorization" in r.stdout


def test_ema_crossing_fails_when_never_below_train(tmp_path):
    rows = [{"step": 500 * (i + 1), "loss": 2000.0 - 20 * i,
             "bits_per_dim": 8.0 - 0.05 * i,
             "kl_per_layer": [5.0, 4.0]} for i in range(40)]
    # every eval far above the train bound at its step
    for s in (10_000, 15_000, 20_000):
        rows.append({"step": s, "eval_bits_per_dim": 12.0})
    r = run(write(tmp_path, rows))
    assert r.returncode == 1
    assert "FAIL EMA crossing" in r.stdout


def test_nan_fails(tmp_path):
    rows = healthy_rows()
    rows[10]["loss"] = float("nan")
    r = run(write(tmp_path, rows))
    assert r.returncode == 1
    assert "FAIL finiteness" in r.stdout


def test_kl_collapse_fails(tmp_path):
    rows = healthy_rows()
    for row in rows[15:]:
        row["kl_per_layer"] = [row["kl_per_layer"][0], 0.001]
    r = run(write(tmp_path, rows))
    assert r.returncode == 1
    assert "FAIL free bits" in r.stdout


def test_no_progress_fails(tmp_path):
    rows = [{"step": 100 * (i + 1), "loss": 1000.0 + i,
             "bits_per_dim": 8.0} for i in range(20)]
    r = run(write(tmp_path, rows))
    assert r.returncode == 1
    assert "FAIL progress" in r.stdout
