"""The perf-regression gate catches per-metric regressions (round-4 verdict
item 5): a forward-kernel-only slowdown — exactly the shape of round 4's
unflagged -10% — must now FAIL the gate even when the headline improves."""

import sys

sys.path.insert(0, "/root/repo/tools")

from bench_gate import gate


def _anchor():
    return {
        "value": 1_000_000.0,
        "extras": {
            "logprob_evals_per_sec": 8_000_000.0,
            "exact_trace_config.train_samples_per_sec": 700_000.0,
            "fused_kernel_roofline.measured_us": {"value": 5.0, "direction": "lower"},
            "adjoint_kernel_roofline.derived_us_per_nfe": {"value": 15.0, "direction": "lower"},
        },
        "tabular": {"power6.train_samples_per_sec": 800_000.0},
    }


def _current(fwd_us=5.0, headline=1_050_000.0):
    return {
        "value": headline,
        "extras": {
            "logprob_evals_per_sec": 8_100_000.0,
            "exact_trace_config": {"train_samples_per_sec": 710_000.0},
            "fused_kernel_roofline": {"measured_us": fwd_us},
            "adjoint_kernel_roofline": {"derived_us_per_nfe": 14.0},
        },
    }


def _tabular(p6=810_000.0):
    return {"tabular": {"power6": {"train_samples_per_sec": p6}}}


def test_gate_passes_at_parity(capsys):
    assert gate(_current(), _anchor(), 0.85, _tabular()) == []


def test_gate_fails_on_forward_kernel_only_regression(capsys):
    """Headline IMPROVES (rode another optimization) while the forward
    kernel regresses 25% — round 4's exact blind spot."""
    fails = gate(_current(fwd_us=6.7, headline=1_100_000.0), _anchor(), 0.85, _tabular())
    assert any("fused_kernel_roofline.measured_us" in f for f in fails)
    assert len(fails) == 1


def test_gate_fails_on_tabular_regression(capsys):
    fails = gate(_current(), _anchor(), 0.85, _tabular(p6=500_000.0))
    assert any("power6" in f for f in fails)


def test_gate_fails_on_missing_tabular_artifact(capsys):
    fails = gate(_current(), _anchor(), 0.85, None)
    assert any("tabular" in f for f in fails)
