"""Measured answer to the q3/q5 join-floor family: what the fact ⋈ fact
join costs when the user stages both facts through the engine's bucketed
stores (sources/sinks.write_bucketed_store) instead of plain parquet.

The canonical q3 row reads driver parquet, so its orderkey exchange is
irreducible (the bare l_orderkey ⋈ o_orderkey exchange alone exceeds
DuckDB's whole query — BENCH_NOTES primitive-floor table). At 100 TB the
engine's mitigation is co-location: orders and lineitem bucketed+sorted
on the join key make the join a ZERO-EXCHANGE sort-merge. This probe
stages both facts once, re-runs q3's plan against the bucketed tables,
verifies value-parity with the parquet plan, asserts the bucketed plan
has no exchange under the join, and prints both timings.

Usage: python tools/bucketed_q3_probe.py [SF_DIR] [NUM_BUCKETS]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _q3_plan(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    hint_shuffle_hash: bool,
) -> DataFrame:
    """The exact q3_shipping_priority plan (queries_core.py), with the
    shuffle_hash hint OPTIONAL: the canonical parquet plan wants it (see
    the comment there), but hinting the bucketed variant would force a
    hash join and throw away the co-located sort-merge the buckets buy."""
    c = customer.filter(F.col("c_mktsegment") == "BUILDING")
    oc = orders.join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_orderdate"
    )
    if hint_shuffle_hash:
        oc = oc.hint("shuffle_hash")
    lr = lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        lr.join(oc, lr["l_orderkey"] == oc["o_orderkey"])
        .groupBy(lr["l_orderkey"].alias("orderkey"), "o_orderdate")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .select(
            "orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from hrdp_variant_load_pipeline_spark.session import get_spark
    from hrdp_variant_load_pipeline_spark.sources.sinks import (
        read_bucketed_store,
        write_bucketed_store,
    )

    spark = get_spark("bucketed-q3-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # r12 verdict directive #3: the co-located measurement must run under
    # the CLUSTER planner posture (AQE on — the sf10 regime), not the
    # small-input bench profile; pin it explicitly so the probe cannot
    # inherit a profile left on a reused session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def best_of(df: DataFrame, n: int = 3) -> float:
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            rows = df.collect()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            assert rows  # q3 returns 10 rows at every SF the probe targets
        return round(best, 3)

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    parquet_q3 = _q3_plan(customer, orders, lineitem, hint_shuffle_hash=True)
    t_parquet = best_of(parquet_q3)

    # stage both facts through the bucketed catalog sink (one-time cost,
    # reported separately — at 100 TB this is the store's ingest format,
    # not a per-query step)
    t0 = time.perf_counter()
    for name, df, sort_cols in (
        ("probe_orders_bkt", orders, ("o_orderkey",)),
        ("probe_lineitem_bkt", lineitem, ("l_orderkey",)),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = spark.conf.get("spark.sql.warehouse.dir") + f"/{name}"
        jpath = spark._jvm.org.apache.hadoop.fs.Path(loc)
        jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jpath, True)
        write_bucketed_store(
            df,
            name,
            bucket_cols=(sort_cols[0],),
            num_buckets=n_buckets,
            sort_cols=sort_cols,
        )
    t_stage = round(time.perf_counter() - t0, 3)

    bucketed_q3 = _q3_plan(
        customer,
        read_bucketed_store(spark, "probe_orders_bkt"),
        read_bucketed_store(spark, "probe_lineitem_bkt"),
        hint_shuffle_hash=False,
    )
    t_bucketed = best_of(bucketed_q3)

    # variant: hash join over the same bucketed scans — bucketing already
    # satisfies the join's distribution requirement, so the hint swaps the
    # sort-merge machinery for a per-bucket hash build with STILL no
    # exchange (checked below on the sort-merge plan; the hash plan shares
    # the scans)
    bucketed_hash_q3 = _q3_plan(
        customer,
        read_bucketed_store(spark, "probe_orders_bkt"),
        read_bucketed_store(spark, "probe_lineitem_bkt"),
        hint_shuffle_hash=True,
    )
    t_bucketed_hash = best_of(bucketed_hash_q3)
    hash_plan = bucketed_hash_q3._jdf.queryExecution().executedPlan().toString()
    hash_exchange_free = (
        "Exchange hashpartitioning(l_orderkey" not in hash_plan
        and "Exchange hashpartitioning(o_orderkey" not in hash_plan
    )

    # value parity between the two plans
    a = sorted(map(tuple, parquet_q3.collect()))
    b = sorted(map(tuple, bucketed_q3.collect()))
    assert a == b, "bucketed plan diverged from the parquet plan"

    # plan contract: no exchange between the bucketed scans and the join
    plan = bucketed_q3._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan

    print(
        json.dumps(
            {
                "metric": "bucketed_q3_probe",
                "sf_dir": sf_dir,
                "num_buckets": n_buckets,
                "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
                "parquet_q3_s": t_parquet,
                "bucketed_smj_q3_s": t_bucketed,
                "bucketed_hash_q3_s": t_bucketed_hash,
                "bucketed_hash_exchange_free": hash_exchange_free,
                "stage_both_facts_s": t_stage,
                "join_exchanges_in_bucketed_plan": 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
