"""Outage-resilience tests for the bench.py driver wrapper (round-3 VERDICT
#1): the driver must ALWAYS get a structured JSON line, whatever the TPU relay
tunnel is doing. No device is touched — the probe/child hooks are patched."""

import importlib.util
import json
import pathlib

import pytest

_REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_for_test",
                                                  _REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _last_json(capsys):
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    return [json.loads(ln) for ln in lines]


def test_success_reprints_child_line(bench, capsys, monkeypatch):
    line = json.dumps({"metric": "greedy_caption_throughput", "value": 30000.0,
                       "unit": "captions/sec/chip", "vs_baseline": 25.0})
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: (True, ""))
    monkeypatch.setattr(bench, "_run_child",
                        lambda t, a: (0, f"some warning\n{line}\n", ""))
    rc = bench.resilient_main([])
    assert rc == 0
    objs = _last_json(capsys)
    assert objs[-1]["value"] == 30000.0 and "error" not in objs[-1]


def test_outage_emits_heartbeats_then_error(bench, capsys, monkeypatch):
    monkeypatch.setenv("VCT_BENCH_WINDOW_S", "0.2")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda **kw: (False, "UNAVAILABLE: tunnel down"))
    rc = bench.resilient_main([])
    assert rc == 0
    objs = _last_json(capsys)
    # every line is structured with the headline metric key
    assert all(o["metric"] == "greedy_caption_throughput" for o in objs)
    assert objs[-1]["error"] == "bench_failed_after_retry_window"
    assert "tunnel down" in objs[-1]["detail"]


def test_code_bug_bails_after_two_attempts(bench, capsys, monkeypatch):
    monkeypatch.setenv("VCT_BENCH_WINDOW_S", "3600")  # would be a long wait
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: (True, ""))

    def child(t, a):
        calls.append(1)
        return 1, "", "ValueError: boom"

    monkeypatch.setattr(bench, "_run_child", child)
    rc = bench.resilient_main([])
    assert rc == 0
    assert len(calls) == 2  # backend was up: a repeat failure is a bug, stop
    objs = _last_json(capsys)
    assert "boom" in objs[-1]["detail"]


def test_recovery_mid_window(bench, capsys, monkeypatch):
    """Tunnel down for the first probes, then back: the real line lands."""
    monkeypatch.setenv("VCT_BENCH_WINDOW_S", "3600")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    state = {"n": 0}

    def probe(**kw):
        state["n"] += 1
        return (state["n"] > 2), "down"

    line = json.dumps({"metric": "greedy_caption_throughput", "value": 1.0})
    monkeypatch.setattr(bench, "_probe_backend", probe)
    monkeypatch.setattr(bench, "_run_child", lambda t, a: (0, line, ""))
    assert bench.resilient_main([]) == 0
    objs = _last_json(capsys)
    assert objs[-1]["value"] == 1.0
    assert sum("error" in o for o in objs) == 2  # two heartbeats while down
