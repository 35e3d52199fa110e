"""Watermark semantics: append-mode windows close once the watermark
passes; late events beyond the watermark are dropped."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "k", "v"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_append_mode_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # batch 1: events up to 10:59 -> watermark (10 min) reaches 10:49
    _write_batch(
        spark,
        src,
        [
            ("2024-01-01 10:00:00", "a", 1.0),
            ("2024-01-01 10:02:00", "a", 2.0),
            ("2024-01-01 10:59:00", "b", 5.0),
        ],
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string, v double").parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("total"))
        .select(F.date_format("w.start", "HH:mm").alias("w_start"), "k", "n", "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .start()
    )
    try:
        q.processAllAvailable()
        # append emits only windows fully below the watermark (10:49):
        # the 10:00 window closes; the 10:55 window stays open
        first = {(r["w_start"], r["k"]): r["n"] for r in spark.table("wm_test").collect()}
        assert first == {("10:00", "a"): 2}

        # batch 2: a LATE event for the already-closed 10:00 window plus an
        # on-time one advancing the watermark past 10:55
        _write_batch(
            spark,
            src,
            [
                ("2024-01-01 10:01:00", "a", 99.0),  # late: beyond watermark, dropped
                ("2024-01-01 11:30:00", "b", 7.0),  # advances watermark to 11:20
            ],
        )
        q.processAllAvailable()
        rows = {(r["w_start"], r["k"]): (r["n"], r["total"]) for r in spark.table("wm_test").collect()}
        # 10:00 window unchanged (late event dropped), 10:55 window emitted
        assert rows[("10:00", "a")] == (2, 3.0)
        assert rows[("10:55", "b")] == (1, 5.0)
        assert ("10:00", "a") in rows and len([k for k in rows if k[1] == "a"]) == 1
    finally:
        q.stop()
