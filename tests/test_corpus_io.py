"""JSONL corpus ingest with quarantine + shard export (sources/corpus_io)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.sources.corpus_io import (
    read_jsonl_docs,
    write_shards,
)


def _write_corpus(tmp_path):
    root = tmp_path / "jsonl" / "part=0"
    root.mkdir(parents=True)
    good = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "hallo welt", "lang": "de"}',
    ]
    bad = [
        '{"doc_id": 3, "text": "truncated',  # cut mid-string
        "not json at all",
    ]
    with gzip.open(root / "a.jsonl.gz", "wt") as f:
        f.write("\n".join(good[:1] + bad[:1]) + "\n")
    with open(root / "b.jsonl", "w") as f:
        f.write("\n".join(good[1:] + bad[1:]) + "\n")
    return str(tmp_path / "jsonl")


def test_read_jsonl_splits_good_and_quarantined(spark, tmp_path):
    path = _write_corpus(tmp_path)
    docs, quarantine = read_jsonl_docs(spark, path)
    got = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    assert got == {1: ("hello world", "en"), 2: ("hallo welt", "de")}
    raws = sorted(r.raw for r in quarantine.collect())
    # every damaged line is preserved verbatim for replay-after-repair
    assert raws == sorted(['{"doc_id": 3, "text": "truncated', "not json at all"])
    # accounting: nothing vanished
    assert docs.count() + quarantine.count() == 4


def test_write_shards_ranges_disjoint_and_ordered(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.range(4000).selectExpr(
        "id % 40 AS bin_id", "id AS doc_id", "repeat('x', 10) AS payload"
    )
    out = str(tmp_path / "shards")
    write_shards(df, out, "bin_id", n_shards=4, order_col="doc_id")
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        cols = {md.schema.column(i).name: i for i in range(len(md.schema))}
        st = [
            md.row_group(g).column(cols["bin_id"]).statistics
            for g in range(md.num_row_groups)
        ]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"shard ranges overlap: {ranges}"
    back = spark.read.parquet(out)
    assert back.count() == 4000
