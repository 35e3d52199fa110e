"""Continuous corpus ingest (streaming/corpus_stream.py): quarantine,
cross-batch near-dup suppression via the persisted index, idempotence."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.sources.store import read_store
from hrdp_variant_load_pipeline_spark.streaming.corpus_stream import (
    stream_corpus_ingest,
)

_B1 = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog tonight", "lang": "en"},
    {"doc_id": 2, "text": "a completely distinct document about spark shuffles and joins", "lang": "en"},
    # intra-batch dup of 1 -> only 1 (lowest id) survives
    {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog tonight", "lang": "en"},
]
_B2 = [
    # near-dup of batch-1's doc 2 -> dropped against the INDEX
    {"doc_id": 10, "text": "a completely distinct document about spark shuffles and sorts", "lang": "en"},
    {"doc_id": 11, "text": "fresh unrelated second batch content with its own words", "lang": "en"},
]


def _write_batch(dirpath, name, rows, corrupt=()):
    lines = [json.dumps(r) for r in rows] + list(corrupt)
    (dirpath / name).write_text("\n".join(lines) + "\n")


def _run(spark, tmp_path, tag):
    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    dirs = {
        k: str(tmp_path / k)
        for k in ("docs", "index", "quarantine", f"ckpt_{tag}")
    }
    stats = {}
    q = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quarantine"],
        dirs[f"ckpt_{tag}"],
        max_files_per_trigger=1,
        on_batch=lambda bid, s: stats.update({bid: s}),
    )
    return src, dirs, stats, q


def test_ingest_dedups_across_batches_and_quarantines(spark, tmp_path):
    src, dirs, stats, q = _run(spark, tmp_path, "a")
    try:
        _write_batch(src, "b1.jsonl", _B1, corrupt=['{"doc_id": broken'])
        q.processAllAvailable()
        _write_batch(src, "b2.jsonl", _B2)
        q.processAllAvailable()
    finally:
        q.stop()

    docs = read_store(spark, dirs["docs"])
    kept = sorted(r.doc_id for r in docs.collect())
    # 3 = intra-batch dup of 1; 10 = near-dup of 2 via the index probe
    assert kept == [1, 2, 11]
    quar = read_store(spark, dirs["quarantine"])
    assert [r.raw for r in quar.collect()] == ['{"doc_id": broken']
    index = read_store(spark, dirs["index"])
    # 3 bands per accepted doc
    assert index.count() == 3 * 3
    assert sorted({r.doc for r in index.collect()}) == [1, 2, 11]
    totals = {k: sum(s[k] for s in stats.values()) for k in ("quarantined", "fresh", "accepted")}
    assert totals == {"quarantined": 1, "fresh": 5, "accepted": 3}


def test_ingest_replay_appends_nothing(spark, tmp_path):
    """A fresh checkpoint over the same input (worst-case replay of every
    batch) must accept zero docs: the exact-id probe drops them before the
    near-dup stage can match them against their own index rows."""
    src, dirs, stats, q = _run(spark, tmp_path, "a")
    try:
        _write_batch(src, "b1.jsonl", _B1, corrupt=['not json'])
        q.processAllAvailable()
    finally:
        q.stop()
    n_docs = read_store(spark, dirs["docs"]).count()
    n_index = read_store(spark, dirs["index"]).count()
    n_quar = read_store(spark, dirs["quarantine"]).count()
    assert n_quar == 1

    stats2 = {}
    q2 = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quarantine"],
        str(tmp_path / "ckpt_b"),
        max_files_per_trigger=1,
        on_batch=lambda bid, s: stats2.update({bid: s}),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert read_store(spark, dirs["docs"]).count() == n_docs
    assert read_store(spark, dirs["index"]).count() == n_index
    # quarantine replay is idempotent too: same batch's lines never double
    assert read_store(spark, dirs["quarantine"]).count() == n_quar
    assert all(s["accepted"] == 0 for s in stats2.values())


def test_ingest_stores_are_doc_range_clustered(spark, tmp_path):
    """Store-level clustering contract: files appended by the ingest
    cover disjoint doc-id ranges (docs AND index stores), which is what
    lets the incremental-dedup candidate pushdown skip files via footer
    min/max instead of scanning the whole fat shingle column."""
    src, dirs, stats, q = _run(spark, tmp_path, "clu")
    # two batches of mutually-distinct word-soup docs (no shingle
    # overlap -> everything is accepted), monotone ids across batches
    b1 = [
        {"doc_id": i, "text": " ".join(f"b1d{i}w{j}" for j in range(12)), "lang": "en"}
        for i in range(100, 220)
    ]
    b2 = [
        {"doc_id": i, "text": " ".join(f"b2d{i}w{j}" for j in range(12)), "lang": "en"}
        for i in range(1000, 1120)
    ]
    _write_batch(src, "b1.jsonl", b1)
    _write_batch(src, "b2.jsonl", b2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(s["accepted"] for s in stats.values()) == len(b1) + len(b2)
    for store, key in ((dirs["docs"], "doc_id"), (dirs["index"], "doc")):
        rows = (
            spark.read.parquet(store)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
            .collect()
        )
        ranges = sorted([(r.lo, r.hi) for r in rows])
        for (_, prev_hi), (lo, _) in zip(ranges, ranges[1:]):
            assert prev_hi < lo, (store, ranges)


def test_quality_filter_gates_before_dedup_and_counts(spark, tmp_path):
    from hrdp_variant_load_pipeline_spark.functions.text import gopher_rules

    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    dirs = {k: str(tmp_path / k) for k in ("docs", "index", "quarantine", "ck")}
    stats = {}
    gate = gopher_rules(
        F.col("text"), min_words=6, min_stopword_hits=0
    )["passes"]
    q = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quarantine"],
        dirs["ck"],
        max_files_per_trigger=1,
        on_batch=lambda bid, s: stats.update({bid: s}),
        quality_filter=gate,
    )
    try:
        rows = [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog", "lang": "en"},
            {"doc_id": 2, "text": "too short", "lang": "en"},  # gated out
            # near-dup of doc 1: must still be dropped by DEDUP (proving
            # the gate did not bypass the dedup path)
            {"doc_id": 3, "text": "the quick brown fox jumps over the lazy cat", "lang": "en"},
        ]
        _write_batch(src, "b1.jsonl", rows)
        q.processAllAvailable()
    finally:
        q.stop()
    docs = read_store(
        spark, dirs["docs"], schema="doc_id LONG, text STRING, lang STRING"
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert ids == [1]  # 2 quality-rejected, 3 dedup-dropped
    s = stats[0]
    assert s["rejected"] == 1 and s["fresh"] == 2 and s["accepted"] == 1
    # the rejected doc paid no index write either
    idx = read_store(
        spark, dirs["index"],
        schema="band LONG, sig STRING, doc LONG",
    )
    assert idx.filter(F.col("doc") == 2).count() == 0


def test_ingest_maintains_text_index(spark, tmp_path):
    """text_index_dir: accepted docs land in the BM25 inverted index,
    one batch-keyed append per micro-batch; probes over the index are
    bit-equal to bm25_scores over the accepted docs store."""
    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        text_index_scores,
        verify_text_index,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    dirs = {k: str(tmp_path / k)
            for k in ("docs", "index", "tix", "quarantine", "ckpt_t")}
    q = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quarantine"],
        dirs["ckpt_t"],
        max_files_per_trigger=1,
        text_index_dir=dirs["tix"],
    )
    try:
        _write_batch(src, "b1.jsonl", _B1)
        q.processAllAvailable()
        _write_batch(src, "b2.jsonl", _B2)
        q.processAllAvailable()
    finally:
        q.stop()

    docs = read_store(spark, dirs["docs"]).select("doc_id", "text")
    assert sorted(r.doc_id for r in docs.collect()) == [1, 2, 11]
    terms = ["quick", "spark", "words"]
    want = {
        r.doc_id: r.bm25
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
        if r.bm25 > 0
    }
    got = {r.doc_id: r.score
           for r in text_index_scores(spark, dirs["tix"], terms).collect()}
    assert got == want
    assert verify_text_index(spark, dirs["tix"])["consistent"]


def test_text_index_survives_checkpoint_wipe(spark, tmp_path):
    """A wiped checkpoint restarts batch ids at 0; the batch_key
    namespace (the stream's stable id) must change with it, or the new
    stream's batches would be silently skipped against the old stream's
    markers and the index would diverge from the docs store."""
    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        text_index_scores,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_scores

    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    dirs = {k: str(tmp_path / k)
            for k in ("docs", "index", "tix", "quarantine", "ck1", "ck2")}
    q = stream_corpus_ingest(
        spark, str(src), dirs["docs"], dirs["index"], dirs["quarantine"],
        dirs["ck1"], max_files_per_trigger=1, text_index_dir=dirs["tix"],
    )
    try:
        _write_batch(src, "b1.jsonl", _B1)
        q.processAllAvailable()
    finally:
        q.stop()
    # "wipe": a NEW checkpoint over the same stores; batch ids restart
    q2 = stream_corpus_ingest(
        spark, str(src), dirs["docs"], dirs["index"], dirs["quarantine"],
        dirs["ck2"], max_files_per_trigger=1, text_index_dir=dirs["tix"],
    )
    try:
        _write_batch(src, "b2.jsonl", _B2)
        q2.processAllAvailable()
    finally:
        q2.stop()

    docs = read_store(spark, dirs["docs"]).select("doc_id", "text")
    # the fresh stream re-reads b1 (new checkpoint) as its batch 0, but
    # the docs-store replay filter drops those ids; batch 1 (=_B2) must
    # still be INDEXED despite the old stream having used batch ids 0/1
    terms = ["quick", "spark", "words"]
    want = {
        r.doc_id: r.bm25
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
        if r.bm25 > 0
    }
    got = {r.doc_id: r.score
           for r in text_index_scores(spark, dirs["tix"], terms).collect()}
    assert got == want
    assert 11 in got  # _B2's fresh doc made it into the index


def test_stream_decontamination_gate(spark, tmp_path):
    """decon_benchmark: docs sharing an n-gram with the eval set are
    dropped BEFORE dedup/appends — never in the docs store, the
    signature index, or the metrics' accepted count; replay of the same
    checkpoint stays a no-op (deterministic gate, no state)."""
    src = tmp_path / "in"
    src.mkdir()
    dirs = {k: str(tmp_path / k) for k in ("docs", "index", "quar", "ckpt")}
    bench = spark.createDataFrame(
        # 8-gram shared with doc 20 below; doc 21 shares nothing
        [("the quick brown fox jumps over the lazy dog benchmark item",)],
        "text string",
    )
    stats = {}
    q = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quar"],
        dirs["ckpt"],
        max_files_per_trigger=1,
        on_batch=lambda bid, s: stats.update({bid: s}),
        decon_benchmark=bench,
        decon_n=8,
    )
    try:
        _write_batch(
            src,
            "b1.jsonl",
            [
                {"doc_id": 20, "text": "intro words then the quick brown fox jumps over the lazy dog closing", "lang": "en"},
                {"doc_id": 21, "text": "a fully clean training document about spark partitions and exchanges", "lang": "en"},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(
        r["doc_id"]
        for r in read_store(spark, dirs["docs"], schema="doc_id BIGINT, text STRING, lang STRING").collect()
    )
    assert ids == [21]
    s = stats[0]
    assert s["contaminated"] == 1 and s["accepted"] == 1
    # the contaminated doc paid no signature append either
    idx_ids = {
        r["doc"]
        for r in read_store(
            spark, dirs["index"],
            schema="doc BIGINT, band_idx INT, band_val STRING, sh ARRAY<STRING>",
        ).collect()
    }
    assert idx_ids == {21}
    # replay with a fresh checkpoint: the gate drops the same doc and
    # the exact-id probe drops the survivor -> nothing new accepted
    stats2 = {}
    q2 = stream_corpus_ingest(
        spark,
        str(src),
        dirs["docs"],
        dirs["index"],
        dirs["quar"],
        str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
        on_batch=lambda bid, s2: stats2.update({bid: s2}),
        decon_benchmark=bench,
        decon_n=8,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert all(v["accepted"] == 0 for v in stats2.values())
    assert all(v["contaminated"] == 1 for v in stats2.values())
