"""Bench-harness hardening tests (no Spark needed).

Round-3 post-mortem: DuckDB prints its progress bar to STDOUT on slow
queries, one unguarded ``json.loads`` of the worker's last stdout line
killed the entire bench artifact. These tests pin the three fixes: the
worker disables the progress bar and pins threads, the per-query parse
degrades to "ERR" instead of raising, and a worker crash degrades the
same way.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


@pytest.mark.skipif(
    not Path("/root/testdata/sf0.001").exists(),
    reason="driver testdata fixture not present",
)
def test_real_worker_round_trip():
    """End-to-end: the patched worker times a trivial oracle at sf0.001."""
    pytest.importorskip("duckdb")
    times = duck_bench.run(
        "/root/testdata/sf0.001",
        ["probe"],
        {"probe": "SELECT count(*) AS n FROM region"},
        timeout=30,
    )
    assert isinstance(times["probe"], float)


def _fat_bench_out() -> dict:
    """Representative worst-case bench dict: full headline set at sf0.1 plus
    a scaled section with per-query Spark AND DuckDB timings (the shape
    that overflowed the driver's 2000-char tail in rounds 2-4)."""
    import bench

    queries = {name: round(0.1 + i * 0.137, 3) for i, name in enumerate(bench.HEADLINE)}
    duck = {name: round(0.05 + i * 0.211, 3) for i, name in enumerate(bench.HEADLINE)}
    duck["dedup_clusters"] = "DNF"
    prov = {
        "cpus": 32,
        "profile": {"spark.sql.adaptive.enabled": "false"},
        "queries": {
            name: {"gc_s": 0.123, "heap_mb": 1234.5, "load1": 1.23}
            for name in queries
        },
    }
    return {
        "metric": "headline_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "provenance": prov,
        "scaled": {
            "sf": 1.0,
            "dir": "/root/repo/benchdata/sf1",
            "duckdb_timeout_s": 60.0,
            "note": "reproduce: python tools/duck_bench.py <dir>; staged via "
            "tools/make_scaled_sf.py 10 <dir>",
            "value": 26.712,
            "queries": queries,
            "duckdb": duck,
            "duckdb_finished_total": 35.131,
            "provenance": prov,
        },
    }


def test_final_line_fits_driver_tail_window():
    """The driver captures only a ~2000-char stdout tail; the final line
    must always fit with margin, even with every optional section present."""
    import bench

    line = bench.final_line(_fat_bench_out())
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total"
    assert parsed["value"] > 0
    assert parsed["sf"] == 0.1
    assert isinstance(parsed["queries"], dict) and len(parsed["queries"]) == len(
        bench.HEADLINE
    )
    assert parsed["scaled"]["value"] == 26.712
    assert parsed["scaled"]["duckdb_finished_total"] == 35.131
    assert parsed["scaled"]["duckdb_unfinished"] == ["dedup_clusters"]
    assert parsed["detail"] == "BENCH_DETAIL.json"
    # per-query GC/heap/load provenance is detail-file-only: it would blow
    # the tail budget and the driver never parses it
    assert "provenance" not in parsed
    assert "provenance" not in parsed["scaled"]


def test_final_line_survives_error_sections():
    out = _fat_bench_out()
    out["scaled"] = {
        "sf": 1.0,
        "error": "spark-scaled: RuntimeError('x' * 400)",
        "duckdb_error": "scaled dir not fully staged",
    }
    import bench

    line = bench.final_line(out)
    assert len(line) < 1500
    parsed = json.loads(line)
    assert parsed["scaled"]["duckdb_error"] == "scaled dir not fully staged"
