"""Incremental near-dup detection: a new batch probed against a persisted
banded-signature index (operators/dedup.py:banded_signatures /
incremental_minhash_dedup)."""

from __future__ import annotations


from hrdp_variant_load_pipeline_spark.operators.dedup import (
    banded_signatures,
    incremental_minhash_dedup,
    minhash_lsh_pairs,
)

_HIST = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different historical content about spark partitions and shuffles"),
    (3, "one more unrelated doc talking about parquet footers and row groups"),
]
_BATCH = [
    # exact dup of history doc 1
    (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    # near dup of history doc 2
    (102, "completely different historical content about spark partitions and joins"),
    # intra-batch dup pair
    (103, "fresh batch text with many specific tokens forming its own cluster"),
    (104, "fresh batch text with many specific tokens forming its own cluster"),
    # unique
    (105, "nothing here resembles anything else in batch or history at all"),
]
_SCHEMA = "doc_id long, text string"


def test_incremental_matches_full_recompute(spark):
    """Ground truth: pairs touching the batch from a FULL minhash run over
    history ∪ batch must equal the incremental probe's pairs."""
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    batch = spark.createDataFrame(_BATCH, _SCHEMA)
    index = banded_signatures(hist, "doc_id", "text")
    inc = incremental_minhash_dedup(batch, index, "doc_id", "text")
    got = {(r.doc_new, r.doc_dup, r.jaccard) for r in inc.collect()}

    full = minhash_lsh_pairs(hist.union(batch), "doc_id", "text")
    batch_ids = {d for d, _ in _BATCH}
    want = set()
    for r in full.collect():
        a, b = r.doc_a, r.doc_b
        if a in batch_ids and b in batch_ids:
            want.add((min(a, b), max(a, b), r.jaccard))
        elif a in batch_ids:
            want.add((a, b, r.jaccard))
        elif b in batch_ids:
            want.add((b, a, r.jaccard))
    assert got == want
    assert len(got) >= 3  # exact-dup, near-dup, intra-batch pair all found


def test_incremental_source_tags_and_unique_doc(spark):
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    batch = spark.createDataFrame(_BATCH, _SCHEMA)
    index = banded_signatures(hist, "doc_id", "text")
    rows = incremental_minhash_dedup(batch, index, "doc_id", "text").collect()
    by_new = {}
    for r in rows:
        by_new.setdefault(r.doc_new, []).append(r)
    assert any(r.doc_dup == 1 and r.source == "index" for r in by_new[101])
    assert any(r.doc_dup == 2 and r.source == "index" for r in by_new[102])
    assert any(
        r.doc_dup == 104 and r.source == "batch" for r in by_new.get(103, [])
    )
    assert 105 not in by_new
    # batch pairs emitted once, oriented doc_new < doc_dup
    batch_pairs = [r for r in rows if r.source == "batch"]
    assert all(r.doc_new < r.doc_dup for r in batch_pairs)


def test_index_roundtrips_through_parquet(spark, tmp_path):
    """The index is a plain DataFrame: persisting and re-reading it must
    not change probe results (hash convention is storage-stable)."""
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    batch = spark.createDataFrame(_BATCH, _SCHEMA)
    path = str(tmp_path / "lsh_index")
    banded_signatures(hist, "doc_id", "text").write.parquet(path)
    reread = spark.read.parquet(path)
    live = incremental_minhash_dedup(batch, banded_signatures(hist, "doc_id", "text"), "doc_id", "text")
    stored = incremental_minhash_dedup(batch, reread, "doc_id", "text")
    assert {tuple(r) for r in live.collect()} == {tuple(r) for r in stored.collect()}


def test_incremental_no_cartesian(spark):
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    batch = spark.createDataFrame(_BATCH, _SCHEMA)
    index = banded_signatures(hist, "doc_id", "text")
    # materialize=False: the default return is checkpointed (its plan is
    # just an RDD scan), so the guard must look at the LAZY plan
    plan = (
        incremental_minhash_dedup(batch, index, "doc_id", "text", materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan  # the real (pre-checkpoint) plan is visible
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_replayed_doc_never_duplicates_itself(spark):
    """Regression (crash between index and docs append): a batch doc whose
    id ALREADY has index rows must not be flagged as a duplicate of
    itself — same-id matches are excluded from the index probe."""
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    batch = spark.createDataFrame(_BATCH, _SCHEMA)
    # index contains the batch's own first-attempt signatures
    index = banded_signatures(hist.union(batch), "doc_id", "text")
    rows = incremental_minhash_dedup(batch, index, "doc_id", "text").collect()
    assert all(r.doc_new != r.doc_dup for r in rows)
    # doc 105 (unique) still accepted; 101 still flagged vs the REAL 1
    flagged = {r.doc_new for r in rows if r.source == "index"}
    assert 105 not in flagged and 101 in flagged


def test_banded_signatures_skip_shingleless_docs(spark):
    """Docs with fewer than k words have no shingles — no index rows (a
    persisted index must not accrete null-band dead rows)."""
    d = spark.createDataFrame(
        [(1, "too short"), (2, "exactly three words here ok")], _SCHEMA
    )
    rows = banded_signatures(d, "doc_id", "text").collect()
    assert {r.doc for r in rows} == {2}
    assert all(r.band_val is not None for r in rows)


def test_pushdown_and_semi_join_paths_agree(spark, tmp_path):
    """The candidate-id pushdown path (default) and the broadcast
    semi-join fallback (pushdown_limit=0) must emit identical pairs."""
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(i, f"w{i} " * 3 + "a b c d e f g") for i in range(20)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(101, "w3 w3 w3 a b c d e f g"), (102, "fresh text nothing shared")],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "idx")
    banded_signatures(hist, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    def rows(**kw):
        return sorted(
            (r.doc_new, r.doc_dup, r.jaccard, r.source)
            for r in incremental_minhash_dedup(
                batch, index, "doc_id", "text", verify_threshold=0.3, **kw
            ).collect()
        )

    assert rows() == rows(pushdown_limit=0)
    assert rows()  # the probe really found something


def test_pushdown_filter_reaches_the_parquet_scan(spark, tmp_path):
    """The shingle fetch built on the pushdown path must show the
    candidate In filter in PushedFilters — that is what lets parquet
    prune row groups by doc min/max so the fat sh column is read only
    from files that can hold a candidate."""
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(5)], "doc_id long, text string"
    )
    idx_path = str(tmp_path / "idx")
    banded_signatures(hist, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    scan = index.select("doc", "sh").filter(F.col("doc").isin([1, 3]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(doc" in plan, plan
