"""DuckDB side of the crossover benchmark: run the bench.py HEADLINE
oracles against a given sf dir, one query per subprocess with a hard
timeout so a super-linear oracle (e.g. the recursive-CTE transitive
closure behind dedup_clusters) cannot wedge the whole run or fill the
disk with spill files.

Usage: python tools/duck_bench.py SF_DIR [TIMEOUT_S] > duck_times.json
Prints one JSON line {query: seconds | "DNF"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

WORKER = r"""
import glob, json, os, sys, time
import duckdb

sf_dir, name = sys.argv[1], sys.argv[2]
sql = json.load(sys.stdin)[name]
con = duckdb.connect()
# slow queries flip DuckDB's progress bar on, and it prints to STDOUT —
# which corrupted the one-line JSON protocol (round-3 bench artifact died
# parsing "100%% ..."); kill it, and pin threads/memory so the timing
# envelope is not hostage to ambient load (the dedup_clusters recursive
# CTE swung 4.2->11.5s across sessions unpinned)
con.execute("SET enable_progress_bar=false")
con.execute("SET progress_bar_time=999999999")
con.execute("SET threads=%(threads)d")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET memory_limit='48GB'")
for t in %(tables)r:
    p = os.path.join(sf_dir, t + ".parquet")
    files = (
        sorted(glob.glob(os.path.join(p, "*.parquet")))
        if os.path.isdir(p)
        else ([p] if os.path.exists(p) else [])
    )
    if files:
        con.execute(
            "CREATE VIEW %%s AS SELECT * FROM read_parquet(%%s)" %% (t, repr(files))
        )
best = None
for _ in range(2):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    el = time.perf_counter() - t0
    best = el if best is None or el < best else best
print(json.dumps(round(best, 3)))
"""


def effective_threads() -> int:
    """Worker thread pin: capped at host cores — a fixed 32 oversubscribes
    smaller hosts and reintroduces the load variance the pin exists to
    remove. Overridable via SPARK_GRAFT_DUCK_THREADS."""
    default = min(32, os.cpu_count() or 32)
    return int(os.environ.get("SPARK_GRAFT_DUCK_THREADS", str(default)))


def run(
    sf_dir: str,
    names: list[str],
    oracles: dict[str, str],
    timeout: float = 120.0,
) -> dict[str, float | str]:
    """Time each named oracle against ``sf_dir``, one subprocess per query
    with a hard timeout. Importable so bench.py can emit the DuckDB
    side-by-side in its own JSON artifact."""
    threads = effective_threads()
    worker_src = WORKER % {"tables": TABLES, "threads": threads}
    payload = json.dumps({k: v for k, v in oracles.items()})
    print(f"# duck_bench: threads={threads}", file=sys.stderr)

    times: dict[str, float | str] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            out = subprocess.run(
                [sys.executable, "-c", worker_src, sf_dir, name],
                input=payload, capture_output=True, text=True, timeout=timeout,
            )
            if out.returncode != 0:
                times[name] = "ERR"
                print(f"# {name}: ERR {out.stderr.strip()[:200]}", file=sys.stderr)
            else:
                # the worker's LAST stdout line is the timing; anything else
                # on stdout (a stray progress bar, a library banner) must
                # degrade THIS row to ERR, never kill the whole artifact
                try:
                    times[name] = json.loads(out.stdout.strip().splitlines()[-1])
                    print(f"# {name}: {times[name]}s", file=sys.stderr)
                except (ValueError, IndexError) as exc:
                    times[name] = "ERR"
                    print(
                        f"# {name}: ERR unparseable worker stdout "
                        f"({exc}): {out.stdout.strip()[-120:]!r}",
                        file=sys.stderr,
                    )
        except subprocess.TimeoutExpired:
            times[name] = "DNF"
            print(f"# {name}: DNF (> {timeout}s)", file=sys.stderr)
        subprocess.run(["rm", "-rf", "/tmp/duck_spill"], check=False)
    return times


def main() -> None:
    import bench
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    times = run(sf_dir, bench.HEADLINE, entrymod.oracle_sql(), timeout)
    print(json.dumps({"threads": effective_threads(), "times": times}))


if __name__ == "__main__":
    main()
