"""Cosine top-k form crossover probe (round-13 verdict directive #4).

The r13 BLAS adoption won 2.1x at sf10 (200k embedding rows) but
regressed the sf0.1 driver row 1.60x (2k rows) — Python-worker + Arrow
startup dominates a corpus that small. This probe MEASURES the
crossover so `brute_force_topk_auto`'s threshold is a pinned number,
not a guess: it stages a size ladder of real embedding vectors (the
sf10 corpus truncated by vec_id, written to its own parquet dir so each
rung pays a realistic scan), then times the JVM zip_with/aggregate form
and the Arrow/BLAS batch-dot form on each rung, same 10-query probe as
the driver row. Value-equality is asserted on every rung before its
timing is reported — the probe cannot pick a wrong-answer winner.

Prints one JSON line; the adopted threshold lands in
`operators/similarity.py::_BLAS_CORPUS_ROWS` and BENCH_NOTES.md.

Usage: python tools/cosine_dispatch_probe.py [SF10_DIR] [OUT_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZES = [2_000, 10_000, 25_000, 50_000, 100_000, 200_000]
REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/benchdata/cosine_ladder"
    )
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_blas,
    )
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark()
    # vec_ids are not dense in the staged sf10 — densify once so the
    # ladder rungs are exact prefixes of one shuffled-but-fixed order
    src = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).selectExpr(
        "row_number() OVER (ORDER BY vec_id) - 1 AS vec_id", "embedding"
    )
    for n in SIZES:
        dst = os.path.join(out_dir, f"n{n}.parquet")
        if not os.path.exists(dst):
            src.filter(F.col("vec_id") < n).repartition(8).write.parquet(dst)

    results = {}
    for n in SIZES:
        corpus = spark.read.parquet(os.path.join(out_dir, f"n{n}.parquet"))
        assert corpus.count() == n, n
        queries = corpus.filter(F.col("vec_id") < 10)
        # parity gate before timing
        a = sorted(
            map(tuple, brute_force_topk(corpus, queries, k=5).collect())
        )
        b = sorted(
            map(tuple, brute_force_topk_blas(corpus, queries, k=5).collect())
        )
        assert a == b and len(a) == 50, f"parity failed at n={n}"
        times = {}
        for name, form in (("jvm", brute_force_topk),
                           ("blas", brute_force_topk_blas)):
            best = None
            for _ in range(REPS):
                t0 = time.monotonic()
                form(corpus, queries, k=5).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
        times["blas_over_jvm"] = round(times["blas"] / times["jvm"], 3)
        results[str(n)] = times
        print(f"n={n}: {times}", file=sys.stderr)

    print(json.dumps({"probe": "cosine_dispatch", "reps": REPS,
                      "queries": 10, "k": 5, "results": results}))


if __name__ == "__main__":
    main()
