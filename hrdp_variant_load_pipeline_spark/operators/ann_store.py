"""Persisted IVF index: the vector-database shape of ``ivf_topk``.

``ivf_topk`` re-assigns the whole corpus to centroids on every call —
right for one-shot queries, wrong for a standing index at 100 TB. Here
the inverted file is MATERIALIZED: vectors are assigned to their
nearest centroid once (row-local, broadcast centroid array — the
corpus never shuffles for assignment) and appended to a store
CLUSTERED BY bucket (``append_to_store(cluster_by=["bucket"])``:
range-repartition + sort-within-partitions, so each parquet file
covers a narrow, disjoint bucket range). A probe then pushes its
``nprobe`` bucket ids into the scan as an IN filter — parquet footer
min/max skips every file outside the probed buckets, so query cost is
O(probed buckets), not O(corpus), with zero Spark-side index structure
to keep in memory.

Norms are precomputed at build time and stored, so probes pay one dot
product per (query, candidate) and nothing per non-candidate.

Scoring reuses ``ivf_topk``'s rounding and tie rules, so a probe over
a fully-built index returns EXACTLY what ``ivf_topk`` returns over the
same corpus + centroids (pinned in tests/test_ann_store.py).

Maintenance: each append tiles the bucket domain independently, so at
ingest frequency a probe reads ~one file per append; run
``sources.store.compact_store(spark, store_dir, sort_by=["bucket",
"vec_id"])`` periodically to re-tile the whole index — keep vec_id as
the secondary key or the replay probe's row-group pruning is silently
lost (probe results are pinned identical across compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hrdp_variant_load_pipeline_spark.operators.similarity import (
    _cent_scored_sql as _cent_scored_sql_rd,
    _collapse_cents,
    _dot_sql,
    _norm_sql,
    _rank_topk,
)
from hrdp_variant_load_pipeline_spark.sources.store import (
    append_to_store,
    read_store,
)

_ROUND = 6


def _cent_array(centroids: DataFrame):
    """Norm + collapse the model-sized centroid set to ONE sorted array
    row (shared shape: similarity._collapse_cents)."""
    return _collapse_cents(
        centroids.selectExpr(
            "cent_id", "cvec", f"{_norm_sql('cvec')} AS cvec_norm"
        )
    )


def _cent_scored_sql(vec: str, vnorm: str) -> str:
    return _cent_scored_sql_rd(vec, vnorm, _ROUND)


def append_ivf_batch(
    vectors: DataFrame,
    centroids: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_partitions: int | None = None,
) -> int:
    """Assign a vector batch to buckets (row-local) and append it to the
    index store clustered by bucket. Incremental by construction — call
    per batch; returns the rows appended. Centroids must be the SAME set
    every call (they define the bucket space; retraining means a
    rebuild)."""
    from hrdp_variant_load_pipeline_spark.sources.tables import (
        spread_for_cpu,
    )

    c = spread_for_cpu(vectors).selectExpr(
        f"`{id_col}` AS vec_id",
        f"`{vec_col}` AS c_vec",
        f"{_norm_sql(f'`{vec_col}`')} AS c_norm",
    )
    assigned = c.crossJoin(F.broadcast(_cent_array(centroids))).selectExpr(
        f"coalesce(array_min({_cent_scored_sql('c_vec', 'c_norm')}).cent_id,"
        " -1L) AS bucket",
        "vec_id",
        "c_vec",
        "c_norm",
    )
    n = assigned.count()
    # vec_id as the secondary clustering key: within each bucket-ranged
    # file, row groups then carry narrow id stats, so the incremental
    # dedup's exact-id replay probe (an id IN filter) prunes row groups
    # instead of scanning the whole id column
    append_to_store(
        assigned, store_dir, cluster_by=["bucket", "vec_id"],
        cluster_partitions=cluster_partitions,
    )
    return n


def ivf_store_topk(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k over the persisted index, reading ONLY the probed buckets.

    The probe list (nprobe nearest centroids per query) is computed
    row-locally on the model-sized query set and its bucket ids are
    collected (<= |queries| x nprobe longs) so the scan carries a
    static ``bucket IN (...)`` filter — pushed to parquet, pruning
    every file whose footer range misses the probed buckets (the
    clustering contract ``append_ivf_batch`` enforces).

    Output: (query_id, neighbor_id, cosine, rank) — ivf_topk's schema,
    rounding, and tie rules.
    """
    q = queries.selectExpr(
        f"`{id_col}` AS query_id",
        f"`{vec_col}` AS q_vec",
        f"{_norm_sql(f'`{vec_col}`')} AS q_norm",
    )
    probes = (
        q.crossJoin(F.broadcast(_cent_array(centroids)))
        .selectExpr(
            "query_id",
            "q_vec",
            "q_norm",
            f"explode(slice(array_sort({_cent_scored_sql('q_vec', 'q_norm')}),"
            f" 1, {nprobe})) AS __p",
        )
        .selectExpr("query_id", "q_vec", "q_norm", "__p.cent_id AS bucket")
        .localCheckpoint()  # probe set is model-sized; compute once for
        # both the driver-side bucket collect and the join below
    )
    needed = sorted(
        {r["bucket"] for r in probes.select("bucket").distinct().collect()}
    )
    # bucket-pruned scan, then the tombstone anti-join: deleted vectors
    # neither match nor rank (delete_from_ann_store)
    idx = _live_vectors(
        spark,
        store_dir,
        read_store(
            spark,
            store_dir,
            schema="bucket BIGINT, vec_id BIGINT, c_vec ARRAY<DOUBLE>, "
            "c_norm DOUBLE",
        ).filter(F.col("bucket").isin(needed)),
    )
    scored = (
        idx.join(F.broadcast(probes), "bucket")
        .where("vec_id != query_id")
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"round({_dot_sql('q_vec', 'c_vec')} / (q_norm * c_norm), "
            f"{_ROUND}) AS cosine",
        )
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------- IVF-PQ
# the billion-scale shape: the store holds PQ CODES (m small ints per
# vector), not raw embeddings — index bytes per vector drop from 8*dim
# to ~m, and probes score candidates by ADC against a broadcast LUT


def append_ivfpq_batch(
    vectors: DataFrame,
    coarse_codebook: DataFrame,
    codebooks: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_partitions: int | None = None,
) -> int:
    """Bucket-assign + PQ-encode a vector batch (both row-local literal
    arithmetic — the corpus never shuffles) and append (bucket, id,
    codes) to the store clustered by bucket. Codebooks must be the SAME
    every call; retraining means a rebuild."""
    from hrdp_variant_load_pipeline_spark.operators.pq import (
        _collect_codebooks,
        coarse_bucket_expr,
        pq_encode,
    )

    coarse = _collect_codebooks(coarse_codebook)[0]
    enc = pq_encode(
        vectors.withColumn("__bucket", coarse_bucket_expr(coarse, vec_col)),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
    ).select(
        F.col("__bucket").alias("bucket"),
        F.col(id_col).alias("vec_id"),
        "pq_codes",
    )
    n = enc.count()
    append_to_store(
        enc, store_dir, cluster_by=["bucket"],
        cluster_partitions=cluster_partitions,
    )
    return n


def ivfpq_store_topk(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    coarse_codebook: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """ADC top-k over the persisted code store, reading ONLY the probed
    buckets (static ``bucket IN`` filter pushed to parquet, same
    contract as :func:`ivf_store_topk`). Matches ``pq.ivfpq_topk``'s
    schema, rounding, and tie rules exactly (pinned).

    Output: (query_id, neighbor_id, approx_dist, rank).
    """
    from pyspark.sql import Window

    from hrdp_variant_load_pipeline_spark.operators.pq import (
        _collect_codebooks,
        _lut_expr,
        adc_score_expr,
        coarse_probes_expr,
    )

    coarse = _collect_codebooks(coarse_codebook)[0]
    cb = _collect_codebooks(codebooks)
    m, n_codes = len(cb), len(cb[0])
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _lut_expr(cb, vec_col).alias("__lut"),
            coarse_probes_expr(coarse, vec_col, nprobe).alias("__probes"),
        )
        .select("query_id", "__lut", F.explode("__probes").alias("bucket"))
        .localCheckpoint()  # model-sized: one compute feeds the driver
        # bucket collect and the join
    )
    needed = sorted(
        {r["bucket"] for r in q.select("bucket").distinct().collect()}
    )
    idx = _live_vectors(
        spark,
        store_dir,
        read_store(
            spark,
            store_dir,
            schema="bucket INT, vec_id BIGINT, pq_codes ARRAY<INT>",
        ).filter(F.col("bucket").isin(needed)),
    )
    score = adc_score_expr(m, n_codes)
    return (
        idx.join(F.broadcast(q), "bucket")
        .where("vec_id != query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(score, 6).alias("approx_dist"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("approx_dist"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("rank") <= k)
    )


# ------------------------------------------------ incremental semantic dedup
def incremental_semantic_dedup(
    new_vectors: DataFrame,
    centroids: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    append_kept: bool = True,
) -> DataFrame:
    """SemDeDup against HISTORY through the persisted IVF index — the
    embedding-space twin of ``dedup.incremental_minhash_dedup``: a new
    batch (a crawl snapshot's embeddings) is checked for semantic
    near-duplicates of everything already ingested, plus of earlier
    same-batch rows, without rescanning the historical corpus.

    Per batch: (1) probe the index with the batch AS queries, nprobe=1 —
    the batch member's own bucket, the same single-cluster pair space
    batch ``semantic_dedup`` searches, so a doc is dropped iff a
    same-bucket historical doc (or a smaller-id same-bucket batch mate,
    checked via one batch-local block join) matches at >= ``threshold``;
    (2) optionally append the kept rows to the index
    (``append_ivf_batch``), making the dedup cumulative. Cost is
    O(batch x probed-bucket rows), never O(history): the probe's bucket
    IN filter prunes the store scan to the batch's own buckets.

    Replay-safe when ``append_kept``: ids already present in the index
    are flagged duplicates up front (an exact-id semi-join probe, batch-
    bounded — the probe cannot ride the cosine path because the scorer
    excludes self-id matches), so re-running a batch flags every row and
    appends nothing (pinned in tests).

    Output: the new batch + ``is_semantic_dup`` (boolean; filter NOT for
    the kept rows). Same keep-the-minimum-id rule as ``semantic_dedup``.
    """
    from hrdp_variant_load_pipeline_spark.operators.similarity import (
        near_dup_pairs,
    )

    clash = {"is_semantic_dup", "__bucket"} & set(new_vectors.columns)
    if clash:
        raise ValueError(
            f"incremental_semantic_dedup: output column(s) {sorted(clash)} "
            "already exist on the input — rename/drop them first (same "
            "rule as semantic_dedup)"
        )
    new_vectors = new_vectors.localCheckpoint()  # stable batch: its plan
    # must not re-read the store the append below mutates
    spark = new_vectors.sparkSession
    # (0) replay probe: batch ids already ingested are duplicates by
    # definition. Bounded batches push their id set INTO the scan as an
    # IN filter (row-group pruning via the vec_id secondary clustering —
    # the incremental_minhash_dedup candidate-pushdown shape); oversized
    # batches fall back to the broadcast semi-join probe.
    # RAW store ids ∪ consumed ids, deliberately NOT the filtered live
    # view: deletion removes a vector from search, it does not free its
    # id — re-ingesting a deleted id is still a replay. The consumed-id
    # union (current tombstones ∪ the vacuum-migrated registry) makes
    # this hold even after vacuum_ann_store physically purges the
    # deleted rows; the registry is a separate store from the tombstones
    # so the per-probe filter does not pay for replay history.
    store_ids = read_store(
        spark,
        store_dir,
        schema="bucket BIGINT, vec_id BIGINT, c_vec ARRAY<DOUBLE>, "
        "c_norm DOUBLE",
    ).select("vec_id").unionByName(_ann_consumed_ids(spark, store_dir))
    # bound the collect itself (limit cap+1), not just the branch — an
    # unthrottled backfill batch must never materialize its full id set
    # on the driver (the incremental_minhash_dedup pushdown shape)
    batch_ids = [
        r[0] for r in new_vectors.select(id_col).limit(10_001).collect()
    ]
    if len(batch_ids) <= 10_000:  # same cap as incremental_minhash_dedup
        replayed = (
            store_ids.filter(F.col("vec_id").isin(batch_ids))
            .distinct()
            .selectExpr(f"vec_id AS `{id_col}`")
        )
    else:
        replayed = store_ids.join(
            F.broadcast(new_vectors.selectExpr(f"`{id_col}` AS vec_id")),
            "vec_id",
            "left_semi",
        ).selectExpr(f"vec_id AS `{id_col}`")
    # (1a) vs history: probe the index with the batch as the query set;
    # nprobe=1 = the batch row's own bucket (SemDeDup's pair space)
    hist_hits = (
        ivf_store_topk(
            spark=spark,
            store_dir=store_dir,
            queries=new_vectors,
            centroids=centroids,
            id_col=id_col,
            vec_col=vec_col,
            k=1,
            nprobe=1,
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("query_id").alias(id_col))
        .distinct()
    )
    # (1b) vs the batch itself: one block join on the assigned bucket;
    # the LARGER id of a matching pair is the duplicate (same rule as
    # semantic_dedup's min-id keeper)
    assigned = new_vectors.crossJoin(
        F.broadcast(_cent_array(centroids))
    ).selectExpr(
        "*",
        f"coalesce(array_min({_cent_scored_sql(f'`{vec_col}`', _norm_sql(f'`{vec_col}`'))}).cent_id,"
        " -1L) AS __bucket",
    )
    batch_pairs = near_dup_pairs(
        assigned, block_cols=["__bucket"], id_col=id_col, vec_col=vec_col,
        threshold=threshold,
    )
    batch_hits = batch_pairs.select(
        F.greatest("id_a", "id_b").alias(id_col)
    ).distinct()
    dup_ids = (
        hist_hits.unionByName(batch_hits).unionByName(replayed).distinct()
    )
    flagged = new_vectors.join(
        dup_ids.withColumn("is_semantic_dup", F.lit(True)), id_col, "left"
    ).fillna({"is_semantic_dup": False})
    # ALWAYS pin the result: its lineage probes the store, which this
    # call (or the caller, in the append_kept=False preview flow) is
    # about to mutate — a lazy plan re-evaluated after the append would
    # find every kept row's own copy and flag 100% duplicates
    flagged = flagged.localCheckpoint()
    if append_kept:
        kept = flagged.filter(~F.col("is_semantic_dup")).select(
            id_col, vec_col
        )
        append_ivf_batch(
            kept, centroids, store_dir, id_col=id_col, vec_col=vec_col
        )
    return flagged


def describe_ivf_index(spark: SparkSession, store_dir: str) -> dict:
    """Index health report: the two numbers that degrade probes.

    * BUCKET SKEW — a hot bucket makes every probe touching it scan its
      whole row set (``max_bucket_frac``; the SemDeDup/IVF fix is more
      centroids, i.e. smaller buckets);
    * FRAGMENTATION — appends tile the bucket domain per batch, so
      ``files_per_bucket`` grows with append count until a
      ``compact_store(sort_by=["bucket", "vec_id"])`` re-tiles.

    One bucket-keyed aggregate (n_centroids-sized result) + one file
    listing; works on both the raw-vector and PQ-code stores.
    """
    idx = read_store(spark, store_dir)
    # project the file name BEFORE aggregating: input_file_name() is
    # non-deterministic and rejected inside aggregate arguments
    rows = (
        idx.select("bucket", F.input_file_name().alias("__f"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("__f").alias("nf"),
        )
        .collect()
    )
    n_total = sum(r["n"] for r in rows)
    max_bucket = max((r["n"] for r in rows), default=0)
    return {
        "n_vectors": int(n_total),
        "n_buckets_used": len(rows),
        "max_bucket_rows": int(max_bucket),
        "max_bucket_frac": (
            round(max_bucket / n_total, 6) if n_total else 0.0
        ),
        "files_per_bucket_max": max((r["nf"] for r in rows), default=0),
        "files_per_bucket_avg": (
            round(sum(r["nf"] for r in rows) / len(rows), 2) if rows else 0.0
        ),
    }


# --------------------------------------------------------------- deletion
# Tombstones live under `<store>/_tombstones`: the underscore prefix makes
# the directory invisible to the index's own parquet scans (Hadoop's
# default path filter skips `_`/`.`-prefixed paths), so the store read
# stays one clean directory while deletion state rides alongside it.
# `_consumed_ids` is the SEPARATE consumed-id registry: vacuum migrates
# tombstoned ids there before clearing the tombstones, so the probe
# filter shrinks back to empty after a purge while the replay probe
# (which must remember every id ever ingested) keeps its union — the two
# concerns grow on different clocks and must not share one file.
_TOMB = "_tombstones"
_CONSUMED = "_consumed_ids"

#: broadcast-hint gate for the tombstone anti-joins (bytes on disk of
#: the tombstone parquet). SemDeDup-flagged drops can be a large corpus
#: fraction, so the filter set is unbounded by design — above this size
#: the hint is withheld and the planner runs a shuffle anti-join (same
#: discipline as corpus_stream's broadcast_probe gate). 16 MiB of
#: parquet-encoded longs is roughly Spark's default
#: autoBroadcastJoinThreshold ballpark once expanded to a hash relation.
_BROADCAST_TOMB_BYTES = 16 * 1024 * 1024


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Filesystem-metadata size of a directory (0 when absent) — a
    per-call broadcast gate must not cost a Spark job."""
    from hrdp_variant_load_pipeline_spark.sources.store import _fs, _jpath

    fs, jvm = _fs(spark, path)
    p = _jpath(jvm, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def _hint_if_small(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    return (
        F.broadcast(df)
        if _dir_bytes(spark, path) <= _BROADCAST_TOMB_BYTES
        else df
    )


def _ids_at(spark: SparkSession, path: str) -> DataFrame:
    fs_path_exists = _dir_bytes(spark, path) > 0
    if not fs_path_exists:
        return spark.createDataFrame([], "vec_id BIGINT")
    return spark.read.parquet(path).select("vec_id")


def _ann_tombstones(spark: SparkSession, store_dir: str) -> DataFrame:
    return _ids_at(spark, f"{store_dir}/{_TOMB}")


def _ann_consumed_ids(spark: SparkSession, store_dir: str) -> DataFrame:
    """Every id ever ingested-then-deleted, across vacuums: current
    tombstones ∪ the vacuum-migrated registry. Feeds ONLY the replay
    probe — never the per-probe filter."""
    return _ann_tombstones(spark, store_dir).unionByName(
        _ids_at(spark, f"{store_dir}/{_CONSUMED}")
    )


def _live_vectors(
    spark: SparkSession, store_dir: str, idx: DataFrame
) -> DataFrame:
    """Anti-join the (already bucket-pruned) index scan against the
    tombstone set — deleted vectors neither match nor rank. The
    broadcast hint is size-gated: a tombstone set past
    ``_BROADCAST_TOMB_BYTES`` (possible when SemDeDup flags a large
    corpus fraction between vacuums) anti-joins by shuffle instead of
    shipping an unbounded id set to every executor. After
    ``vacuum_ann_store`` the filter set is EMPTY again (consumed ids
    move to their own registry), so steady-state probes pay nothing."""
    tomb = _ann_tombstones(spark, store_dir).distinct()
    return idx.join(
        _hint_if_small(spark, tomb, f"{store_dir}/{_TOMB}"),
        "vec_id",
        "left_anti",
    )


def delete_from_ann_store(
    spark: SparkSession,
    store_dir: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> int:
    """Logical deletion for the persisted IVF / IVF-PQ index: tombstone
    vector ids so probes (``ivf_store_topk`` / ``ivfpq_store_topk`` and
    therefore ``incremental_semantic_dedup``'s history matching) exclude
    them — the removal path when SemDeDup-flagged or taken-down
    documents must stop matching, without rewriting the clustered store.

    Ids not present in the store, or already tombstoned, are ignored —
    deletes are idempotent under replay. The ID NAMESPACE STAYS
    CONSUMED: ``incremental_semantic_dedup``'s exact-id replay probe
    deliberately reads the raw store, so re-ingesting a deleted id is
    still flagged as a replay (ids are unique-once; deletion removes a
    vector from SEARCH, it does not free its id). Physical purge =
    rebuild; ``compact_store`` preserves the tombstone dir (underscore
    paths are not data files). Returns ids newly tombstoned."""
    req = ids.select(F.col(id_col).cast("long").alias("vec_id")).distinct()
    prior = _ann_tombstones(spark, store_dir).distinct()
    fresh = req.join(
        _hint_if_small(spark, prior, f"{store_dir}/{_TOMB}"),
        "vec_id",
        "left_anti",
    )
    present = (
        read_store(spark, store_dir, schema="vec_id BIGINT")
        .select("vec_id")
        .join(F.broadcast(fresh), "vec_id", "left_semi")
        .distinct()
        .localCheckpoint()
    )
    n = present.count()
    if n:
        present.write.mode("append").parquet(f"{store_dir}/{_TOMB}")
    return n


def vacuum_ann_store(
    spark: SparkSession,
    store_dir: str,
    sort_by: list[str] | None = None,
) -> int:
    """Physically purge tombstoned vectors: commit a new store version
    containing only live rows (clustered on ``sort_by``, default
    ``["bucket", "vec_id"]`` — keep vec_id secondary or the replay
    probe's row-group pruning degrades), migrate the tombstoned ids into
    the ``_consumed_ids`` registry (``incremental_semantic_dedup``'s
    replay probe unions it in, so a deleted id stays a replay even after
    its rows are gone), then CLEAR the tombstones — after a vacuum the
    per-probe anti-join filter is empty again, so probe cost does not
    grow with deletion history (the registry feeds only the
    batch-bounded replay probe, never the probe filter). Crash-safe:
    each boundary re-converges on the next vacuum call (a crash between
    the registry append and the tombstone clear re-migrates
    idempotently — the append is anti-joined against the registry).
    Returns rows purged. No-op (returns 0) when nothing is tombstoned.
    """
    from hrdp_variant_load_pipeline_spark.sources.store import (
        _fs,
        _jpath,
        commit_store_version,
    )

    tomb = _ann_tombstones(spark, store_dir).distinct().localCheckpoint()
    if not tomb.take(1):
        return 0
    tomb_hinted = _hint_if_small(spark, tomb, f"{store_dir}/{_TOMB}")
    idx = read_store(spark, store_dir)
    n_dead = idx.join(tomb_hinted, "vec_id", "left_semi").count()
    if n_dead:
        live = idx.join(tomb_hinted, "vec_id", "left_anti")
        keys = sort_by or ["bucket", "vec_id"]
        live = live.repartitionByRange(*keys).sortWithinPartitions(*keys)
        # localCheckpoint BEFORE the commit: live's lineage reads the
        # store the commit supersedes (same rule as every store-mutating
        # path)
        commit_store_version(live.localCheckpoint(), store_dir)
    # registry migration AFTER the purge commit (a crash in between
    # leaves the tombstones standing, so nothing is forgotten); the
    # anti-join makes a replayed migration append nothing
    consumed_path = f"{store_dir}/{_CONSUMED}"
    fresh_ids = tomb.join(
        _ids_at(spark, consumed_path), "vec_id", "left_anti"
    ).localCheckpoint()
    if fresh_ids.take(1):
        fresh_ids.write.mode("append").parquet(consumed_path)
    fs, jvm = _fs(spark, store_dir)
    tpath = _jpath(jvm, f"{store_dir}/{_TOMB}")
    if fs.exists(tpath):
        fs.delete(tpath, True)
    return int(n_dead)
