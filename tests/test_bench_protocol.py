"""bench.py outage-hardening protocol tests.

Round 4 lost its driver perf metric because a relay outage made bench.py
exit rc=1 before printing any JSON.  These tests pin the contract that can
never happen again:

1. forced-outage path: bench.py STILL prints exactly one parseable JSON
   line (rc=0) with an ``error`` field and last-good values marked stale;
2. success path (tiny CPU mode): the full parent->child subprocess
   protocol (health probe, measurement child, JSON-lines hand-off) runs
   end-to-end and yields fresh numbers with the dispersion fields.

Reference analog: none -- the reference has no benchmark surface
(/root/reference/README.md); the contract here is the driver's
(BASELINE.json: one JSON line with metric/value/unit/vs_baseline).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")


def _run_bench(extra_env, timeout=300):
    env = os.environ.copy()
    # the child must not inherit the test session's 8-virtual-device flags
    env.pop("XLA_FLAGS", None)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        cwd=ROOT,
        timeout=timeout,
    )
    return proc


def _parse_single_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines!r}"
    return json.loads(lines[0])


def test_forced_outage_emits_stale_json_rc0():
    """A dead relay must never zero the round: rc=0, one JSON line,
    error field present, last-good numbers marked stale."""
    proc = _run_bench({"BENCH_FORCE_OUTAGE": "1"})
    assert proc.returncode == 0, proc.stderr[-1000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["metric"].startswith("ggn_matvecs_per_sec")
    assert "error" in out and "forced outage" in out["error"]
    assert out["stale"] is True
    # last-good cache is seeded in-repo, so stale values must be present
    assert out["value"] is not None
    assert out["vs_baseline"] is not None
    assert "stale_source" in out


def test_forced_outage_without_last_good(tmp_path, monkeypatch):
    """Even with NO last-good cache, the line is still printed and
    parseable (value null, error set)."""
    # run from a copy of bench.py in a bare directory: no BENCH_LAST_GOOD
    bench_copy = tmp_path / "bench.py"
    bench_copy.write_text(open(BENCH).read())
    # it imports the package + benchmarks from the repo
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)
    env["BENCH_FORCE_OUTAGE"] = "1"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(bench_copy)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["value"] is None
    assert out["stale"] is True
    assert "error" in out


def test_health_probe_failure_falls_back(tmp_path):
    """A health probe that cannot initialize any backend (bogus platform)
    exercises the REAL child-subprocess failure path, not the forced flag:
    bounded retries, then the stale JSON line."""
    proc = _run_bench({
        "BENCH_PLATFORM": "no_such_platform",
        "BENCH_HEALTH_TIMEOUT": "60",
        "BENCH_HEALTH_RETRIES": "2",
        "BENCH_HEALTH_BACKOFF": "1",
    })
    assert proc.returncode == 0, proc.stderr[-1000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["stale"] is True
    assert "unavailable" in out["error"]


def test_health_probe_hang_is_killed_and_falls_back():
    """The ACTUAL round-4 failure mode was a silent relay HANG, not a raised
    error: the health child must be killed at the timeout and the stale
    JSON line still printed."""
    proc = _run_bench({
        "BENCH_FAKE_HANG": "1",
        "BENCH_HEALTH_TIMEOUT": "3",
        "BENCH_HEALTH_RETRIES": "2",
        "BENCH_HEALTH_BACKOFF": "1",
    }, timeout=120)
    assert proc.returncode == 0, proc.stderr[-1000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["stale"] is True
    assert "hung" in out["error"]


def test_global_deadline_forces_fallback_line():
    """The one failure the fallback JSON cannot survive is an OUTSIDE kill
    (driver timeout); the global deadline guarantees the line prints first.
    With the budget already exhausted, no child is even attempted."""
    proc = _run_bench({"BENCH_DEADLINE": "0.1"}, timeout=60)
    assert proc.returncode == 0, proc.stderr[-1000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["stale"] is True
    assert "deadline reached" in out["error"]


@pytest.mark.slow
def test_tiny_cpu_success_path():
    """Full protocol success on CPU with a tiny MLP: health child passes,
    measurement child returns matvec + step records, output carries fresh
    dispersion fields and does NOT touch the real last-good cache."""
    last_good = os.path.join(ROOT, "BENCH_LAST_GOOD.json")
    before = open(last_good).read() if os.path.exists(last_good) else None
    proc = _run_bench({
        "BENCH_TINY": "1",
        "BENCH_PLATFORM": "cpu",
        "BENCH_HEALTH_TIMEOUT": "120",
        "BENCH_MEASURE_TIMEOUT": "300",
    }, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["metric"].endswith("_tiny")
    assert "error" not in out
    assert out["value"] and out["value"] > 0
    assert out["dispersion"]["n_repeats"] >= 3
    assert "iqr_pct" in out["dispersion"]
    assert out["hf_step_ms"] > 0
    assert out["hf_step_ms_per_cg_iter"] > 0
    # tiny mode must never pollute the real problem's last-good cache
    after = open(last_good).read() if os.path.exists(last_good) else None
    assert after == before
