"""Zipf-skew join drill (round-12 verdict directive #2).

The skew story so far is plan-argued on uniform TPC-H-ish keys; this
drill OBSERVES it. It stages a deliberately skewed copy of the sf10
lineitem — one hot orderkey absorbing >=20% of all rows, the rest of
the key mass redistributed Zipf-ish over the surviving keys — then
measures the lineitem ⋈ orders → group-agg shape three ways:

  aqe_skew   plain join, AQE on with skew-join handling
             (the session default, session.py)
  static     plain join, AQE off (what a mis-tuned cluster would run)
  salted     operators.skew.salted_join (blanket salt spread)
  adaptive   operators.skew.adaptive_salted_join (hot keys detected on
             a 0.1% sample, only those salted; cold keys join plain)
  preagg     operators.skew.pre_aggregated_join (eager aggregation:
             the fact collapses to one row per key BEFORE the join —
             the strongest treatment when the consumer is aggregative)

All three run the same logical query as the `skew_salted_join_agg`
driver row; row-count and grouped totals are asserted equal across
strategies before any timing is reported, so the drill cannot adopt a
wrong-answer winner. DuckDB runs the same join on the same skewed
parquet for an external yardstick. Prints one JSON line; findings land
in BENCH_NOTES.md and the winner becomes the documented recommendation.

Staging: hash-deterministic (no RNG) — row r moves to the hot key when
xxhash64(r.rowid) % 5 == 0 (20%), else keeps its key, so the fixture is
reproducible bit-for-bit and needs no stored seed.

Usage: python tools/skew_drill.py [SF10_DIR] [OUT_DIR] [HOT_FRAC_DENOM]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

HOT_KEY = 1  # an orderkey guaranteed to exist in orders


def stage(spark, sf_dir: str, out_dir: str, denom: int) -> None:
    """Skew lineitem: 1/denom of ALL rows remapped onto HOT_KEY."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    skewed = li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"),
                F.lit(denom),
            )
            == 0,
            F.lit(HOT_KEY).cast("long"),
        ).otherwise(F.col("l_orderkey")),
    )
    skewed.write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    # orders unchanged — link it cheaply
    src = os.path.join(sf_dir, "orders.parquet")
    dst = os.path.join(out_dir, "orders.parquet")
    if not os.path.exists(dst):
        os.symlink(src, dst)


def _query(spark, out_dir: str, strategy: str):
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.skew import (
        adaptive_salted_join,
        salted_join,
    )

    li = spark.read.parquet(
        os.path.join(out_dir, "lineitem.parquet")
    ).select("l_orderkey", "l_extendedprice")
    o = spark.read.parquet(os.path.join(out_dir, "orders.parquet")).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    if strategy == "preagg":
        from hrdp_variant_load_pipeline_spark.operators.skew import (
            pre_aggregated_join,
        )

        return (
            pre_aggregated_join(
                li, o, ["l_orderkey"], sum_cols=["l_extendedprice"]
            )
            .groupBy("o_orderpriority")
            .agg(
                F.sum("n_rows").cast("long").alias("n"),
                F.round(F.sum("sum_l_extendedprice"), 2).alias("total"),
            )
        )
    if strategy == "salted":
        joined = salted_join(li, o, ["l_orderkey"], salt=16)
    elif strategy == "adaptive":
        joined = adaptive_salted_join(
            li, o, ["l_orderkey"], salt=16, sample_fraction=0.001
        )
    else:
        joined = li.join(o, "l_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf10_skew"
    )
    denom = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark("skew-drill")
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        stage(spark, sf_dir, out_dir, denom)

    # verify the staged skew is what we claim
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(out_dir, "lineitem.parquet"))
    n_total = li.count()
    n_hot = li.filter(F.col("l_orderkey") == HOT_KEY).count()
    hot_frac = n_hot / n_total

    # ground truth once (AQE default), for cross-strategy equality.
    # Counts must match exactly; the grouped SUM over ~12M doubles per
    # hot group accumulates summation-order error beyond the 2dp round
    # (different plans fold in different orders), so totals compare to
    # relative tolerance instead of bit-equality.
    def _rows(strategy):
        return {
            r[0]: (int(r[1]), float(r[2]))
            for r in _query(spark, out_dir, strategy).collect()
        }

    def _same(a, b):
        if a.keys() != b.keys():
            return False
        for key in a:
            (n1, t1), (n2, t2) = a[key], b[key]
            if n1 != n2:
                return False
            if abs(t1 - t2) > 1e-9 * max(abs(t1), abs(t2), 1.0):
                return False
        return True

    truth = _rows("aqe_skew")

    times: dict[str, float] = {}
    for strategy in ("aqe_skew", "static", "salted", "adaptive", "preagg"):
        if strategy == "static":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", "true"
            )
        got = _rows(strategy)
        assert _same(got, truth), f"{strategy} diverged from ground truth"
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _query(spark, out_dir, strategy).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        times[strategy] = round(best, 3)
        print(f"# {strategy}: {times[strategy]:.3f}s", file=sys.stderr)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()

    import duck_bench

    sql = """
    SELECT o.o_orderpriority, count(*) AS n,
           round(sum(l.l_extendedprice)::DOUBLE, 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """
    duck = duck_bench.run(
        out_dir, ["skew_join"], {"skew_join": sql}, timeout=300.0
    )

    print(
        json.dumps(
            {
                "metric": "skew_drill",
                "sf_dir": out_dir,
                "rows": n_total,
                "hot_key_frac": round(hot_frac, 4),
                "spark": times,
                "duckdb": duck,
                "winner": min(times, key=times.get),
            }
        )
    )


if __name__ == "__main__":
    main()
