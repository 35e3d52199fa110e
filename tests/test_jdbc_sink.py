"""Real JDBC round-trip for the batched sink (DAO.java:68-119 parity).

Uses embedded Apache Derby — its jars ship on Spark's classpath — so the
test exercises the actual JDBC write path (connection, batching, append
mode) without an external database. Embedded Derby is single-JVM, which
matches local mode; a production deployment points the same
``write_jdbc`` at Oracle/Postgres with executor-parallel connections.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.sources.sinks import (
    JDBC_INSERT_BATCH,
    split_variant_sinks,
    write_jdbc,
)


def test_jdbc_round_trip_variant_sinks(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"

    variants = spark.range(0, 257).select(
        (F.col("id") + 9_000_000).alias("rgd_id"),
        F.lit("A").alias("ref_nuc"),
        F.lit("snv").alias("variant_type"),
        F.lit("G").alias("var_nuc"),
        F.concat(F.lit("rs"), F.col("id")).alias("rs_id"),
        F.lit(None).cast("string").alias("clinvar_id"),
        F.lit(3).alias("species_type_key"),
        F.lit("1").alias("chromosome"),
        (F.col("id") * 10 + 1).alias("start_pos"),
        (F.col("id") * 10 + 1).alias("end_pos"),
        F.lit(None).cast("string").alias("padding_base"),
        F.lit("GENIC").alias("genic_status"),
        F.lit(372).alias("map_key"),
    )
    variant, variant_map_data = split_variant_sinks(variants)

    # small batchsize forces multiple JDBC batches within one partition
    write_jdbc(variant, url, "variant", mode="overwrite", batchsize=100)
    write_jdbc(variant_map_data, url, "variant_map_data", mode="overwrite", batchsize=100)
    # append mode is the reference's normal path — second write doubles rows
    write_jdbc(variant_map_data, url, "variant_map_data", batchsize=JDBC_INSERT_BATCH)

    back = spark.read.format("jdbc").option("url", url).option("dbtable", "variant").load()
    assert back.count() == 257
    assert {r["RGD_ID"] for r in back.select("RGD_ID").collect()} == set(
        range(9_000_000, 9_000_257)
    )
    back2 = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "variant_map_data")
        .load()
    )
    assert back2.count() == 2 * 257
    # predicate pushdown through the JDBC source still works on read-back
    assert back2.filter(F.col("START_POS") < 101).count() == 2 * 10
