"""Perf-regression gate logic: must fail on a simulated regression.

The reference gates PR benchmarks relative to origin/main
(`/root/reference/.github/workflows/Benchmark.yml`); `tools/bench_gate.py`
is the equivalent here.  These tests exercise the gate logic and the CLI
exit codes on synthetic bench results (no TPU needed).
"""

import json
import subprocess
import sys

import pytest


def _mk_result(value, logprob):
    return {
        "metric": "train_samples_per_sec_per_chip",
        "value": value,
        "extras": {"logprob_evals_per_sec": logprob, "device": "test"},
    }


def test_gate_logic_pass_and_fail():
    sys.path.insert(0, "tools")
    from bench_gate import gate

    anchor = {"value": 1000.0, "extras": {"logprob_evals_per_sec": 500.0}}
    assert gate(_mk_result(1000.0, 500.0), anchor, 0.85) == []
    assert gate(_mk_result(2000.0, 900.0), anchor, 0.85) == []  # improvement ok
    fails = gate(_mk_result(700.0, 500.0), anchor, 0.85)
    assert len(fails) == 1 and "train_samples_per_sec_per_chip" in fails[0]
    fails = gate(_mk_result(1000.0, 300.0), anchor, 0.85)
    assert len(fails) == 1 and "logprob_evals_per_sec" in fails[0]
    # missing metric in current counts as failure, not silent pass
    broken = _mk_result(1000.0, 500.0)
    del broken["extras"]["logprob_evals_per_sec"]
    assert len(gate(broken, anchor, 0.85)) == 1


def test_gate_cli_exit_codes(tmp_path):
    anchor = tmp_path / "anchor.json"
    anchor.write_text(json.dumps({"value": 1000.0, "extras": {}}))

    def run(value):
        cur = tmp_path / "cur.json"
        cur.write_text(json.dumps(_mk_result(value, 1.0)))
        return subprocess.run(
            [sys.executable, "tools/bench_gate.py", "--current", str(cur),
             "--anchor", str(anchor)],
            capture_output=True, text=True,
        )

    ok = run(990.0)
    assert ok.returncode == 0, ok.stderr
    bad = run(700.0)
    assert bad.returncode == 1
    assert "REGRESSION" in bad.stdout or "regressed" in bad.stderr

    # update rebases the anchor intentionally
    cur = tmp_path / "cur.json"
    cur.write_text(json.dumps(_mk_result(1200.0, 1.0)))
    up = subprocess.run(
        [sys.executable, "tools/bench_gate.py", "--current", str(cur),
         "--anchor", str(anchor), "--update"],
        capture_output=True, text=True,
    )
    assert up.returncode == 0
    assert json.loads(anchor.read_text())["value"] == 1200.0

    # missing anchor -> usage error
    missing = subprocess.run(
        [sys.executable, "tools/bench_gate.py", "--current", str(cur),
         "--anchor", str(tmp_path / "nope.json")],
        capture_output=True, text=True,
    )
    assert missing.returncode == 2
