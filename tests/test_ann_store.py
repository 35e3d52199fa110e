"""Persisted IVF index (operators/ann_store.py): probe-vs-ivf_topk
equivalence over batched builds, bucket pushdown into the scan, and
file-level clustering (footer disjointness on bucket)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.ann_store import (
    append_ivf_batch,
    ivf_store_topk,
)
from hrdp_variant_load_pipeline_spark.operators.similarity import (
    ivf_topk,
    train_centroids,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _setup(spark, tmp_path, n_centroids=8):
    e = spark.read.parquet(EMB)
    cents = train_centroids(e, n_centroids=n_centroids, n_iter=3)
    store = str(tmp_path / "ivf")
    # build in two batches — the index is incremental by construction
    n1 = append_ivf_batch(e.filter(F.col("vec_id") % 2 == 0), cents, store)
    n2 = append_ivf_batch(e.filter(F.col("vec_id") % 2 == 1), cents, store)
    assert n1 + n2 == e.count()
    return e, cents, store


def test_store_probe_matches_ivf_topk(spark, tmp_path):
    e, cents, store = _setup(spark, tmp_path)
    queries = e.filter(F.col("vec_id") < 6)
    got = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))
    want = sorted(map(tuple, ivf_topk(
        e, queries, k=5, nprobe=2, centroids=cents
    ).collect()))
    assert got == want and got


def test_probe_pushes_bucket_filter_into_scan(spark, tmp_path):
    e, cents, store = _setup(spark, tmp_path)
    queries = e.filter(F.col("vec_id") < 3)
    plan = (
        ivf_store_topk(spark, store, queries, cents, k=5, nprobe=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the static IN filter reaches the parquet source (footer pruning)
    assert "PushedFilters: [In(bucket" in plan.replace("\n", " "), plan


def test_index_files_are_bucket_disjoint(spark, tmp_path):
    """The clustering contract: each written file covers a narrow bucket
    range, so min/max footers actually prune (a hash-scattered append
    would give every file the full bucket span). Pin the file count so
    AQE can't coalesce this tiny fixture to one file."""
    e = spark.read.parquet(EMB)
    cents = train_centroids(e, n_centroids=8, n_iter=3)
    store = str(tmp_path / "ivf")
    append_ivf_batch(e, cents, store, cluster_partitions=4)
    per_file = (
        spark.read.parquet(store)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 3
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    # range-clustered: spans tile the bucket domain without interleaving
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans
    assert all(hi - lo <= 4 for lo, hi in spans), spans


def test_ivfpq_store_probe_matches_ivfpq_topk(spark, tmp_path):
    """The code store (bucket, id, pq_codes) probed by ADC must equal
    pq.ivfpq_topk over the same corpus + codebooks, across a two-batch
    incremental build; the probe's bucket filter reaches the scan."""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        append_ivfpq_batch,
        ivfpq_store_topk,
    )
    from hrdp_variant_load_pipeline_spark.operators.pq import (
        ivfpq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet(EMB)
    coarse = train_pq_codebooks(e, m=1, n_codes=8, n_iter=3)
    cb = train_pq_codebooks(e, m=4, n_codes=16, n_iter=3)
    store = str(tmp_path / "ivfpq")
    n1 = append_ivfpq_batch(e.filter(F.col("vec_id") % 2 == 0), coarse, cb, store)
    n2 = append_ivfpq_batch(e.filter(F.col("vec_id") % 2 == 1), coarse, cb, store)
    assert n1 + n2 == e.count()
    queries = e.filter(F.col("vec_id") < 6)
    probe = ivfpq_store_topk(spark, store, queries, coarse, cb, k=5, nprobe=2)
    got = sorted(map(tuple, probe.collect()))
    want = sorted(map(tuple, ivfpq_topk(
        e, queries, coarse, cb, nprobe=2, k=5
    ).collect()))
    assert got == want and got
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(bucket" in plan.replace("\n", " "), plan


def test_compaction_preserves_probe_results(spark, tmp_path):
    """Per-append clustering fragments across MANY appends (each append's
    files tile the bucket domain independently); periodic
    compact_store(sort_by=["bucket"]) re-tiles the whole index. Probe
    results must be byte-identical before and after."""
    from hrdp_variant_load_pipeline_spark.sources.store import compact_store

    e = spark.read.parquet(EMB)
    cents = train_centroids(e, n_centroids=8, n_iter=3)
    store = str(tmp_path / "ivf")
    for i in range(4):  # 4 small appends -> fragmented tiling
        append_ivf_batch(e.filter(F.col("vec_id") % 4 == i), cents, store)
    queries = e.filter(F.col("vec_id") < 4)
    before = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))
    compact_store(spark, store, target_partitions=4, sort_by=["bucket", "vec_id"])
    after = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))
    assert after == before and before


def test_incremental_semantic_dedup_vs_history_and_replay(spark, tmp_path):
    """New batches dedup semantically against everything already
    ingested (through the index probe — history never rescanned), plus
    earlier same-batch mates; replaying a batch flags every row and
    appends nothing."""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        incremental_semantic_dedup,
    )
    from hrdp_variant_load_pipeline_spark.sources.store import read_store

    e = spark.read.parquet(EMB)
    cents = train_centroids(e, n_centroids=8, n_iter=3)
    store = str(tmp_path / "sem")

    batch1 = e.filter(F.col("vec_id") < 40)
    r1 = incremental_semantic_dedup(batch1, cents, store, threshold=0.999)
    n_kept1 = r1.filter(~F.col("is_semantic_dup")).count()
    assert n_kept1 > 0
    assert read_store(spark, store).count() == n_kept1

    # batch 2: exact copies of batch-1 vectors under NEW ids -> every
    # row matches history at cosine 1.0 and is flagged
    copies = batch1.select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    r2 = incremental_semantic_dedup(copies, cents, store, threshold=0.999)
    flagged = {
        row["vec_id"]
        for row in r2.filter(F.col("is_semantic_dup")).collect()
    }
    kept1_ids = {
        row["vec_id"] + 10_000
        for row in r1.filter(~F.col("is_semantic_dup")).collect()
    }
    assert kept1_ids <= flagged  # every kept-history copy is caught
    assert read_store(spark, store).count() == n_kept1 + r2.filter(
        ~F.col("is_semantic_dup")
    ).count()

    # replay batch 1 verbatim: exact-id probe flags everything, store
    # unchanged
    n_before = read_store(spark, store).count()
    r3 = incremental_semantic_dedup(batch1, cents, store, threshold=0.999)
    assert r3.filter(~F.col("is_semantic_dup")).count() == 0
    assert read_store(spark, store).count() == n_before

    # intra-batch: two fresh ids, identical vectors -> larger id flagged
    v = e.filter(F.col("vec_id") == 500).select("embedding").collect()
    if v:
        pair = spark.createDataFrame(
            [(20_001, v[0][0]), (20_002, v[0][0])],
            "vec_id long, embedding array<double>",
        )
        r4 = incremental_semantic_dedup(pair, cents, store, threshold=0.999)
        got = {
            row["vec_id"]: row["is_semantic_dup"] for row in r4.collect()
        }
        assert got[20_002] is True  # larger id is the duplicate


def test_describe_ivf_index_reports_skew_and_fragmentation(spark, tmp_path):
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        describe_ivf_index,
    )
    from hrdp_variant_load_pipeline_spark.sources.store import compact_store

    e = spark.read.parquet(EMB)
    cents = train_centroids(e, n_centroids=8, n_iter=3)
    store = str(tmp_path / "ivf")
    for i in range(3):  # 3 appends -> fragmented tiling
        append_ivf_batch(e.filter(F.col("vec_id") % 3 == i), cents, store)
    d = describe_ivf_index(spark, store)
    assert d["n_vectors"] == e.count()
    assert 1 <= d["n_buckets_used"] <= 8
    assert 0 < d["max_bucket_frac"] <= 1.0
    frag_before = d["files_per_bucket_max"]
    assert frag_before >= 2  # multiple appends tile independently
    compact_store(spark, store, target_partitions=2,
                  sort_by=["bucket", "vec_id"])
    d2 = describe_ivf_index(spark, store)
    assert d2["n_vectors"] == d["n_vectors"]
    assert d2["files_per_bucket_max"] <= frag_before  # re-tiled


def test_delete_tombstones_vectors_and_matches_filtered_recompute(
    spark, tmp_path
):
    """Deletion: tombstoned vectors vanish from probes — the store probe
    equals ivf_topk over the corpus WITHOUT the deleted rows; deletes
    are idempotent, unknown ids are ignored, and the id namespace stays
    consumed (a deleted id re-ingested through incremental_semantic_dedup
    is still flagged as a replay)."""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        delete_from_ann_store,
        incremental_semantic_dedup,
    )

    e, cents, store = _setup(spark, tmp_path)
    victims = e.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    n_victims = victims.count()
    assert delete_from_ann_store(spark, store, victims) == n_victims
    # replay + unknown id: no-op
    extra = victims.union(
        spark.createDataFrame([(999_999,)], "vec_id long")
    )
    assert delete_from_ann_store(spark, store, extra) == 0

    queries = e.filter(F.col("vec_id") < 6)
    got = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))
    survivors = e.filter(F.col("vec_id") % 7 != 0)
    want = sorted(map(tuple, ivf_topk(
        survivors, queries, k=5, nprobe=2, centroids=cents
    ).collect()))
    assert got == want and got
    assert all(t[1] % 7 != 0 for t in got)  # no tombstoned neighbor

    # id namespace: a deleted id re-submitted is flagged as replay
    reingest = e.filter(F.col("vec_id") == 0)  # vec 0 was deleted (0%7==0)
    flagged = incremental_semantic_dedup(
        reingest, cents, store, append_kept=False
    )
    assert [r.is_semantic_dup for r in flagged.collect()] == [True]


def test_delete_applies_to_ivfpq_probe_too(spark, tmp_path):
    """The second probe path: after deletion the ADC probe equals
    ivfpq_topk over the surviving corpus."""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        append_ivfpq_batch,
        delete_from_ann_store,
        ivfpq_store_topk,
    )
    from hrdp_variant_load_pipeline_spark.operators.pq import (
        ivfpq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet(EMB)
    coarse = train_pq_codebooks(e, m=1, n_codes=8, n_iter=3)
    cb = train_pq_codebooks(e, m=4, n_codes=16, n_iter=3)
    store = str(tmp_path / "ivfpq")
    append_ivfpq_batch(e, coarse, cb, store)
    victims = e.filter(F.col("vec_id") % 6 == 0).select("vec_id")
    assert delete_from_ann_store(spark, store, victims) == victims.count()
    queries = e.filter(F.col("vec_id") < 6)
    got = sorted(map(tuple, ivfpq_store_topk(
        spark, store, queries, coarse, cb, k=5, nprobe=2
    ).collect()))
    want = sorted(map(tuple, ivfpq_topk(
        e.filter(F.col("vec_id") % 6 != 0), queries, coarse, cb,
        nprobe=2, k=5,
    ).collect()))
    assert got == want and got
    assert all(t[1] % 6 != 0 for t in got)


def test_vacuum_purges_rows_but_keeps_consumed_ids(spark, tmp_path):
    """Vacuum physically removes tombstoned rows; probe results are
    unchanged, and the consumed-id registry survives — a deleted id
    re-submitted through incremental_semantic_dedup is STILL a replay
    after the purge."""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        delete_from_ann_store,
        incremental_semantic_dedup,
        vacuum_ann_store,
    )
    from hrdp_variant_load_pipeline_spark.sources.store import read_store

    e, cents, store = _setup(spark, tmp_path)
    victims = e.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    n = victims.count()
    assert delete_from_ann_store(spark, store, victims) == n
    queries = e.filter(F.col("vec_id") < 6)
    before = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))

    assert vacuum_ann_store(spark, store) == n
    assert vacuum_ann_store(spark, store) == 0  # registry kept, rows gone

    after = sorted(map(tuple, ivf_store_topk(
        spark, store, queries, cents, k=5, nprobe=2
    ).collect()))
    assert after == before
    assert read_store(spark, store).filter("vec_id % 9 = 0").count() == 0
    # consumed namespace survives the purge
    reingest = e.filter(F.col("vec_id") == 9)
    flagged = incremental_semantic_dedup(
        reingest, cents, store, append_kept=False
    )
    assert [r.is_semantic_dup for r in flagged.collect()] == [True]


def test_vacuum_splits_probe_filter_from_consumed_registry(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: the per-probe tombstone anti-join must not pay for
    deletion HISTORY. After a vacuum the tombstone (probe-filter) set is
    empty and the ids live in the separate consumed registry; a second
    delete→vacuum generation behaves identically, and replays of BOTH
    generations' ids stay flagged."""
    from hrdp_variant_load_pipeline_spark.operators import ann_store as mod
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        _ann_consumed_ids,
        _ann_tombstones,
        delete_from_ann_store,
        incremental_semantic_dedup,
        vacuum_ann_store,
    )

    e, cents, store = _setup(spark, tmp_path)
    gen1 = e.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    n1 = gen1.count()
    assert delete_from_ann_store(spark, store, gen1) == n1
    assert vacuum_ann_store(spark, store) == n1
    # probe filter shrank to empty; registry holds the generation
    assert _ann_tombstones(spark, store).count() == 0
    assert _ann_consumed_ids(spark, store).count() == n1

    # second generation over the purged store
    gen2 = e.filter(F.col("vec_id") % 9 == 1).select("vec_id")
    n2 = gen2.count()
    assert delete_from_ann_store(spark, store, gen2) == n2
    assert _ann_tombstones(spark, store).count() == n2  # only gen2
    # shuffle fallback path: with the broadcast gate forced shut the
    # probe still excludes gen2 and ranks identically
    monkeypatch.setattr(mod, "_BROADCAST_TOMB_BYTES", -1)
    queries = e.filter(F.col("vec_id") < 6)
    got = ivf_store_topk(spark, store, queries, cents, k=5, nprobe=2)
    assert all(
        r[1] % 9 != 0 and r[1] % 9 != 1 for r in got.collect()
    )
    monkeypatch.undo()
    assert vacuum_ann_store(spark, store) == n2
    assert _ann_tombstones(spark, store).count() == 0
    assert _ann_consumed_ids(spark, store).count() == n1 + n2

    # replays of both generations are still replays after both vacuums
    replay = e.filter(F.col("vec_id").isin(0, 9, 10))  # 0,9 gen1; 10 gen2
    flagged = incremental_semantic_dedup(
        replay, cents, store, append_kept=False
    )
    assert all(r.is_semantic_dup for r in flagged.collect())
