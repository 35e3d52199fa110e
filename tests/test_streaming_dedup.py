"""Streaming exact-dedup: duplicates within the watermark horizon drop,
first arrival wins, state expires with the watermark."""

from __future__ import annotations

import json
import os

from hrdp_variant_load_pipeline_spark.streaming.stateful import dedup_stream


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, payload string")
        .json(src)
    )
    deduped = dedup_stream(
        stream, keys=("event_id",), event_time_col="ts", watermark="10 minutes"
    )
    query = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        _write_batch(
            src,
            "b1.json",
            [
                {"event_id": 1, "ts": "2024-01-01T00:00:00", "payload": "first"},
                {"event_id": 1, "ts": "2024-01-01T00:00:05", "payload": "dup-in-batch"},
                {"event_id": 2, "ts": "2024-01-01T00:00:10", "payload": "first"},
            ],
        )
        query.processAllAvailable()
        # replayed delivery of event 1 within the horizon + one new event
        _write_batch(
            src,
            "b2.json",
            [
                {"event_id": 1, "ts": "2024-01-01T00:01:00", "payload": "dup-replay"},
                {"event_id": 3, "ts": "2024-01-01T00:01:30", "payload": "first"},
            ],
        )
        query.processAllAvailable()
        got = spark.read.parquet(out)
        rows = {(r["event_id"], r["payload"]) for r in got.collect()}
        assert rows == {(1, "first"), (2, "first"), (3, "first")}, rows
    finally:
        query.stop()
