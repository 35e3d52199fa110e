"""Bucketed variant store: co-located store-probe joins skip the store
shuffle.

At production scale every load probes a variant store that dwarfs the
incoming batch; bucketing the store on its join keys means the planner
reads it pre-partitioned and the join exchanges ONLY the small batch
side. These tests pin that plan property, not just values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.sources.sinks import (
    read_bucketed_store,
    write_bucketed_store,
)


def _store_df(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("rgd_id"),
        (F.col("id") % 20 + 1).cast("string").alias("chromosome"),
        (F.col("id") * 7 % 100_000).alias("start_pos"),
        F.lit("snv").alias("variant_type"),
    )


def test_bucketed_roundtrip_and_colocated_join(spark, tmp_path):
    # saveAsTable writes managed files under the session warehouse dir
    # (static config); the DROP TABLE in the finally removes them
    name = "test_variant_store_bucketed"
    write_bucketed_store(
        _store_df(spark),
        name,
        bucket_cols=("chromosome", "start_pos"),
        num_buckets=8,
        sort_cols=("chromosome", "start_pos"),
    )
    try:
        store = read_bucketed_store(spark, name)
        assert store.count() == 5000

        # probe batch: tiny, NOT bucketed — mimics one load's candidates.
        # Disable auto-broadcast so the join would otherwise be a full
        # shuffle join; with the bucketed store only the probe side may
        # exchange.
        probe = _store_df(spark, 200).select("chromosome", "start_pos")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = store.join(probe, ["chromosome", "start_pos"], "left_semi")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            n_exchanges = plan.count("Exchange hashpartitioning")
            assert n_exchanges == 1, plan  # probe side only; store reads buckets
            assert "Bucketed: true" in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        # bucket-key aggregation also skips the exchange
        agg = store.groupBy("chromosome", "start_pos").agg(
            F.count("*").alias("n")
        )
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
