"""bench.py supervisor behavior: the driver must ALWAYS get a parseable
final JSON line, whatever the tunnel does mid-measurement.

These tests run bench.py's parent logic against stubbed children (no
jax, no TPU): the probe is forced alive and the child body is replaced
via _CENTERPOLY_BENCH_STUB, which bench.py does not know about — we
monkeypatch sys.executable-level behavior by invoking main() with a
patched subprocess.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _run_main(monkeypatch, capsys, child_behavior: str,
              deadline: str = "20"):
    # default deadline is generous: bare `python -c` startup is ~3 s on
    # this host, and the deadline must cut hangs, not startup
    """Run bench.main() with the probe forced OK and the measurement
    child replaced by a tiny python stub."""
    monkeypatch.setattr(bench, "ensure_backend", lambda **kw: 1.0)
    monkeypatch.setenv("CENTERPOLY_BENCH_TIMEOUT", deadline)
    # Never touch the REAL chip lock from tests: a live queue step holds
    # it for hours, and each stubbed main() would sleep-poll the full
    # CENTERPOLY_LOCK_WAIT (observed: the whole suite wedged behind a
    # train A/B holding the lock).  Tests get a private lock, no wait.
    monkeypatch.setenv("CENTERPOLY_LOCK_FILE",
                       f"/tmp/centerpoly_test_{os.getpid()}.lock")
    monkeypatch.setenv("CENTERPOLY_LOCK_WAIT", "0")

    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        assert kw["env"]["_CENTERPOLY_BENCH_CHILD"] == "1"
        return real_popen([sys.executable, "-c", child_behavior],
                          stdout=kw["stdout"], stderr=kw["stderr"],
                          text=kw.get("text", False))

    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code or 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
    return rc, [json.loads(ln) for ln in lines]


PRIMARY_LINE = json.dumps({
    "metric": bench.PRIMARY_METRIC, "value": 0.005, "unit": "s/frame",
    "vs_baseline": 9.0})


class TestBenchSupervisor:
    def test_success_relays_child_output(self, monkeypatch, capsys):
        child = (f"print('''{PRIMARY_LINE}''')")
        rc, recs = _run_main(monkeypatch, capsys, child)
        assert rc == 0
        assert recs[-1]["metric"] == bench.PRIMARY_METRIC
        assert recs[-1]["value"] == 0.005

    def test_child_crash_yields_error_json(self, monkeypatch, capsys):
        rc, recs = _run_main(monkeypatch, capsys,
                             "import sys; sys.exit(3)")
        assert rc == 1
        last = recs[-1]
        assert last["metric"] == bench.PRIMARY_METRIC
        assert last["value"] is None
        assert "rc=3" in last["error"]

    def test_timeout_without_primary_yields_error_json(
            self, monkeypatch, capsys):
        child = "import time; time.sleep(60)"
        rc, recs = _run_main(monkeypatch, capsys, child, deadline="2")
        assert rc == 1
        last = recs[-1]
        assert last["value"] is None
        assert "deadline" in last["error"]

    def test_timeout_after_primary_promotes_it(self, monkeypatch, capsys):
        # the child measured + flushed the primary, then hung on a
        # secondary: the parent must end with the REAL number, rc=0
        # generous deadline: the child must have time to START (python
        # init takes seconds when the host core is busy) — the hang
        # afterwards is what the deadline is meant to cut
        child = (f"import time, sys\n"
                 f"print('''{PRIMARY_LINE}''', flush=True)\n"
                 f"time.sleep(300)\n")
        rc, recs = _run_main(monkeypatch, capsys, child, deadline="15")
        assert rc == 0
        last = recs[-1]
        assert last["metric"] == bench.PRIMARY_METRIC
        assert last["value"] == 0.005

    def test_dead_backend_yields_error_json(self, monkeypatch, capsys):
        monkeypatch.setattr(bench, "ensure_backend", lambda **kw: None)
        rc = 0
        try:
            bench.main()
        except SystemExit as e:
            rc = e.code or 0
        out = capsys.readouterr().out
        last = json.loads(out.splitlines()[-1])
        assert rc == 1
        assert last["metric"] == bench.PRIMARY_METRIC
        assert last["value"] is None
