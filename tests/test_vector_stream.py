"""stream_topk_maintain (streaming/vector_stream.py): a parquet vector
stream folds into a persisted standing top-k — equivalence to the batch
recompute, per-batch cost shape, and replay idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from hrdp_variant_load_pipeline_spark.sources.store import read_store
from hrdp_variant_load_pipeline_spark.streaming.vector_stream import (
    stream_topk_maintain,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def vec_batches(spark, tmp_path):
    e = spark.read.parquet(EMB)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        e.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            str(in_dir / f"b{i}")
        )
    # flatten: the stream reads one directory of files
    files = sorted(p for p in in_dir.rglob("*.parquet"))
    flat = tmp_path / "stream"
    flat.mkdir()
    for j, p in enumerate(files):
        p.rename(flat / f"part{j}.parquet")
    return e, str(flat)


def test_stream_topk_matches_batch_and_replays_idempotent(
    spark, vec_batches, tmp_path
):
    e, in_dir = vec_batches
    queries = e.filter(F.col("vec_id") < 5)
    store = str(tmp_path / "topk")
    counts = []
    q = stream_topk_maintain(
        spark, in_dir, queries, store, str(tmp_path / "ck"),
        k=7, max_files_per_trigger=1,
        on_batch=lambda bid, m: counts.append(m),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(counts) >= 2  # really ran micro-batched
    got = sorted(map(tuple, read_store(spark, store).collect()))
    want = sorted(map(tuple, brute_force_topk(e, queries, k=7).collect()))
    assert got == want

    # fresh-checkpoint replay over the SAME directory: every fold is a
    # duplicate, the standing result must not change
    q2 = stream_topk_maintain(
        spark, in_dir, queries, store, str(tmp_path / "ck2"),
        k=7, max_files_per_trigger=1,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = sorted(map(tuple, read_store(spark, store).collect()))
    assert again == want
