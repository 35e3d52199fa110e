"""Bench-harness hardening tests (no Spark needed).

Round-3 post-mortem: DuckDB prints its progress bar to STDOUT on slow
queries, one unguarded ``json.loads`` of the worker's last stdout line
killed the entire bench artifact. These tests pin the three fixes: the
worker disables the progress bar and pins threads, the per-query parse
degrades to "ERR" instead of raising, and a worker crash degrades the
same way.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import duck_bench  # noqa: E402


def test_worker_pins_runtime_settings():
    assert "SET enable_progress_bar=false" in duck_bench.WORKER
    assert "SET threads=" in duck_bench.WORKER
    assert "SET memory_limit=" in duck_bench.WORKER


def test_unparseable_worker_stdout_degrades_to_err(monkeypatch):
    """A progress bar (or any garbage) on the worker's stdout must cost
    one row, not the artifact."""

    def fake_run(*args, **kwargs):
        if kwargs.get("capture_output"):
            return SimpleNamespace(
                returncode=0,
                stdout="100% ▕██▏ 7.041\n",
                stderr="",
            )
        return SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(duck_bench.subprocess, "run", fake_run)
    times = duck_bench.run("/nonexistent", ["q"], {"q": "SELECT 1"}, timeout=5)
    assert times == {"q": "ERR"}


def test_empty_worker_stdout_degrades_to_err(monkeypatch):
    def fake_run(*args, **kwargs):
        return SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(duck_bench.subprocess, "run", fake_run)
    times = duck_bench.run("/nonexistent", ["q"], {"q": "SELECT 1"}, timeout=5)
    assert times == {"q": "ERR"}


def test_worker_crash_degrades_to_err(monkeypatch):
    def fake_run(*args, **kwargs):
        if kwargs.get("capture_output"):
            return SimpleNamespace(returncode=1, stdout="", stderr="boom")
        return SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(duck_bench.subprocess, "run", fake_run)
    times = duck_bench.run("/nonexistent", ["q"], {"q": "SELECT 1"}, timeout=5)
    assert times == {"q": "ERR"}


def test_timeout_degrades_to_dnf(monkeypatch):
    def fake_run(*args, **kwargs):
        if kwargs.get("capture_output"):
            raise subprocess.TimeoutExpired(cmd="worker", timeout=5)
        return SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(duck_bench.subprocess, "run", fake_run)
    times = duck_bench.run("/nonexistent", ["q"], {"q": "SELECT 1"}, timeout=5)
    assert times == {"q": "DNF"}


def test_real_worker_round_trip():
    """End-to-end: the patched worker times a trivial oracle at sf0.001."""
    times = duck_bench.run(
        "/root/testdata/sf0.001",
        ["probe"],
        {"probe": "SELECT count(*) AS n FROM region"},
        timeout=30,
    )
    assert isinstance(times["probe"], float)
