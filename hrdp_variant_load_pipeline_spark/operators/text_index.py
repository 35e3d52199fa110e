"""Persisted inverted index (term → posting list): the text-retrieval
twin of the ANN store (`operators/ann_store.py`), for standing keyword
search over a corpus — retrieval-based data selection and
decontamination-by-search without rescanning 100 TB of text per query.

``bm25_scores`` (operators/vocab.py) re-tokenizes the whole corpus on
every call — right for one-shot scoring, wrong for a standing index.
Here the postings are MATERIALIZED: each ingest batch tokenizes once,
reduces to (term, doc) term frequencies, and appends them to a store
CLUSTERED BY (bucket, term) — ``bucket = pmod(xxhash64(term), n)`` is an
engine-internal routing key (never compared across engines), so each
parquet file covers a narrow, disjoint bucket range and a probe's
``bucket IN (...)`` filter prunes at the footer level, with the
secondary term sort narrowing row groups further. Corpus-wide BM25
statistics (N, Σdl) reduce to ONE long-typed row per append in a side
store, so probes never touch the corpus at all.

A probe over a fully-built index returns EXACTLY the scores
``bm25_scores`` computes over the same corpus (pinned in
tests/test_text_index.py): term frequencies are the same integers, the
per-term float association mirrors the operator term-for-term, and the
per-document sum folds contributions in query-term order (absent terms
contribute an exact +0.0, which IEEE addition ignores), so the two
paths agree bit-for-bit, not approximately.

Scale shape: an append pays one (doc, term)-keyed aggregate plus the
store's bucket-range shuffle — O(tokens) wire, once per batch. A probe
reads O(postings of the probed terms): the term→bucket mapping is
computed on a query-sized frame, df arrives from ONE tiny aggregate
over the already-pruned postings, and the top-k is a
TakeOrderedAndProject, never a global sort. Ids must be unique across
appends (same contract as the ANN store); re-ingesting a doc_id
double-counts its postings. Run ``sources.store.compact_store(spark,
postings_dir, sort_by=["bucket", "term"])`` periodically to re-tile —
keep term as the secondary key or row-group pruning on the term IN
filter silently degrades (probe parity across compaction is pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hrdp_variant_load_pipeline_spark.operators.vocab import bm25_tokens
from hrdp_variant_load_pipeline_spark.sources.store import (
    append_to_store,
    read_store,
)

_POSTINGS = "postings"
_STATS = "stats"
_POSTINGS_SCHEMA = (
    "bucket BIGINT, term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT"
)
# n_buckets rides every stats row: the routing modulus is a property of
# the STORE, not of a call site — a probe recomputing buckets under a
# different modulus would silently filter out valid postings, so probes
# derive it from here and appends refuse a drifted value. batch_key is
# the at-least-once commit marker: the stats row is written AFTER the
# postings, so a present key proves the batch fully landed and a replay
# skips it; postings duplicated by a crashed attempt are neutralized by
# the probes' (distinct) over the pruned frame.
_STATS_SCHEMA = "n_docs BIGINT, sum_dl BIGINT, n_buckets BIGINT, batch_key STRING"


def _bucket_of(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("long")


def _stats_summary(spark: SparkSession, store_dir: str) -> dict:
    """ONE read of the model-sized stats ledger: corpus totals and the
    persisted routing modulus (mixed moduli fail loud — rebuild). Every
    stats consumer goes through here so the validation cannot drift
    between call sites. Commit-marker keys are deliberately NOT
    collected — a long-lived stream writes one marker per micro-batch,
    so materializing the full key set on the driver per call would grow
    without bound; membership is checked distributedly
    (``_has_marker_key``) and set differences via anti-join
    (``_marker_keys_df``)."""
    st = (
        read_store(spark, f"{store_dir}/{_STATS}", schema=_STATS_SCHEMA)
        .agg(
            F.sum("n_docs").alias("n"),
            F.sum("sum_dl").alias("s"),
            F.collect_set("n_buckets").alias("nbs"),
        )
        .collect()[0]
    )
    nbs = sorted(int(v) for v in st["nbs"] if v is not None)
    if len(nbs) > 1:
        raise ValueError(
            f"text index at {store_dir} has mixed n_buckets {nbs}; "
            "rebuild the store"
        )
    return {
        "n": int(st["n"] or 0),
        "s": int(st["s"] or 0),
        "nb": nbs[0] if nbs else None,
    }


def _marker_keys_df(spark: SparkSession, store_dir: str) -> DataFrame:
    """Distinct non-null commit-marker keys as a DataFrame (one column
    ``batch_key``) — for anti-join set arithmetic, never a driver
    collect."""
    return (
        read_store(spark, f"{store_dir}/{_STATS}", schema=_STATS_SCHEMA)
        .select("batch_key")
        .filter(F.col("batch_key").isNotNull())
        .distinct()
    )


def _has_marker_key(spark: SparkSession, store_dir: str, key: str) -> bool:
    """Membership probe for one commit-marker key: a filtered count over
    the ledger (one scalar back to the driver), not a collect of the
    whole key set."""
    return bool(
        read_store(spark, f"{store_dir}/{_STATS}", schema=_STATS_SCHEMA)
        .filter(F.col("batch_key") == key)
        .take(1)
    )


def append_text_index_batch(
    docs: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    cluster_partitions: int | None = None,
    batch_key: str | None = None,
) -> int:
    """Tokenize a document batch ONCE (the staged frame is pinned with
    ``localCheckpoint`` — batch-sized by construction — so the stats
    aggregate and the postings append share the same tokenization pass),
    reduce to (term, doc) postings, and append them clustered by
    (bucket, term). Also appends the batch's (n_docs, Σdl, n_buckets)
    row to the side stats store — documents with no tokens (including
    NULL text) produce no postings but still count toward N/avgdl,
    exactly as ``bm25_scores`` counts them. ``n_buckets`` is persisted
    with the store; an append under a different modulus than earlier
    appends is refused (it would corrupt probe routing). The two writes
    (postings, then stats) are file-granular, not atomic — pass
    ``batch_key`` (a stable per-batch id, e.g. the micro-batch id) to
    make the append REPLAY-IDEMPOTENT under at-least-once delivery: the
    stats row doubles as the batch's commit marker, so a replay whose
    key is already present skips entirely, and a crashed attempt's
    orphaned postings are both uncounted-and-harmless (probes distinct
    the pruned postings, so exact-duplicate rows score once). Without a
    ``batch_key``, run ``verify_text_index`` after unclean shutdowns and
    rebuild on inconsistency (blind re-appending would double-count).
    Returns docs ingested (0 when the batch_key was already committed).
    """
    spark = docs.sparkSession
    st = _stats_summary(spark, store_dir)
    if st["nb"] is not None and st["nb"] != n_buckets:
        raise ValueError(
            f"append_text_index_batch: store was built with "
            f"n_buckets={st['nb']}, got {n_buckets}"
        )
    if batch_key is not None and _has_marker_key(spark, store_dir, batch_key):
        return 0
    staged = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            bm25_tokens(F.col(text_col)).alias("__w"),
        )
        .select("doc_id", F.size("__w").cast("long").alias("dl"), "__w")
        .localCheckpoint()
    )
    stats = staged.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    postings = (
        staged.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("doc_id", "dl", "term")  # dl rides the key (functionally
        # dependent on doc_id) so no first()-style pick is needed
        .agg(F.count("*").alias("tf"))
        .select(
            _bucket_of(F.col("term"), n_buckets).alias("bucket"),
            "term",
            "doc_id",
            "tf",
            "dl",
        )
    )
    postings = postings.localCheckpoint()  # one tf-aggregate feeds both
    # the inverted append and the forward (doc → term-vector) rollup
    append_to_store(
        postings,
        f"{store_dir}/{_POSTINGS}",
        cluster_by=["bucket", "term"],
        cluster_partitions=cluster_partitions,
    )
    forward = (
        postings.groupBy("doc_id", "dl")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", "tf"))
            ).alias("__p")
        )
        .select(
            "doc_id",
            # explicit casts: collect_list yields containsNull=false
            # array types, which parquet reads back as containsNull=true
            # — without the cast the SECOND append trips the store's
            # schema-drift refusal on that invisible difference
            F.transform("__p", lambda p: p["term"])
            .cast("array<string>")
            .alias("terms"),
            F.transform("__p", lambda p: p["tf"])
            .cast("array<bigint>")
            .alias("tfs"),
            "dl",
        )
    )
    append_to_store(
        forward,
        f"{store_dir}/{_FORWARD}",
        cluster_by=["doc_id"],
        cluster_partitions=cluster_partitions,
    )
    append_to_store(
        spark.createDataFrame(
            [(int(stats["n_docs"]), int(stats["sum_dl"] or 0), n_buckets,
              batch_key)],
            _STATS_SCHEMA,
        ),
        f"{store_dir}/{_STATS}",
    )
    return int(stats["n_docs"])


def text_index_scores(
    spark: SparkSession,
    store_dir: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 of every MATCHED document against a query-term bag, reading
    ONLY the probed terms' postings (bucket IN + term IN pushed to the
    parquet scan) and the model-sized stats store — the corpus text is
    never touched.

    Output: (doc_id, score). Only documents containing ≥1 query term
    appear (everything else scores an exact 0.0 under BM25) — the same
    relation as filtering ``bm25_scores`` output to score > 0, and
    bit-equal to it row for row (tests/test_text_index.py)."""
    if not terms:
        raise ValueError("text_index_scores: empty query")
    if len(set(terms)) != len(terms):
        raise ValueError("text_index_scores: duplicate query terms")
    # ONE read of the model-sized stats store yields corpus stats AND
    # the persisted routing modulus (a probe recomputing buckets under a
    # caller-guessed modulus would silently filter out valid postings;
    # an explicit n_buckets is only accepted as a cross-check)
    st = _stats_summary(spark, store_dir)
    if n_buckets is not None and st["nb"] is not None and n_buckets != st["nb"]:
        raise ValueError(
            f"text_index_scores: store was built with n_buckets="
            f"{st['nb']}, got {n_buckets}"
        )
    nb = st["nb"] if st["nb"] is not None else (n_buckets or 64)
    n_docs = st["n"]
    if n_docs == 0:
        return spark.createDataFrame([], "doc_id BIGINT, score DOUBLE")
    # exact avg: integer-valued doubles below 2^53, same value avg() sees
    avgdl = float(st["s"]) / float(n_docs)
    if avgdl == 0.0:  # every ingested doc tokenless -> no postings exist
        return spark.createDataFrame([], "doc_id BIGINT, score DOUBLE")
    # term → (fold position, bucket): computed on a query-sized frame so
    # the bucket function stays the engine-side xxhash64 (never
    # reimplemented driver-side, where a drift would silently mis-route)
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "ti INT, term STRING"
    ).select("ti", "term", _bucket_of(F.col("term"), nb).alias("bucket"))
    trows = tdf.collect()
    needed = sorted({r["bucket"] for r in trows})

    # distinct over the PRUNED frame (probed terms only): exact-duplicate
    # posting rows from a crashed-then-replayed batch append score once —
    # O(probed postings) for crash-tolerance everywhere. Tombstoned docs
    # drop out via a broadcast anti-join BEFORE df counting, so deleted
    # docs neither appear nor inflate any term's df.
    post = _live_postings(
        spark,
        store_dir,
        read_store(spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA)
        .filter(F.col("bucket").isin(needed))
        .filter(F.col("term").isin(list(terms)))
        .distinct(),
    )
    # df per probed term: ONE tiny aggregate over the pruned postings
    # (ids unique across appends ⇒ one posting per (term, doc))
    dfs = {r["term"]: r["df"] for r in
           post.groupBy("term").agg(F.count("*").alias("df")).collect()}
    tmeta = spark.createDataFrame(
        [(r["ti"], r["term"], float(dfs.get(r["term"], 0))) for r in trows],
        "ti INT, term STRING, df DOUBLE",
    )
    n_lit = F.lit(float(n_docs))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    # float association mirrors bm25_scores term-for-term (vocab.py)
    idf = F.log(1.0 + (n_lit - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = tf + k1 * (1.0 - b + b * dl / F.lit(avgdl))
    contrib = (
        post.join(F.broadcast(tmeta), "term")
        .select(
            "doc_id",
            F.col("ti"),
            (idf * tf * (k1 + 1.0) / denom).alias("__c"),
        )
    )
    # fold per-term contributions in query order: bm25_scores sums terms
    # 0..m-1 from 0.0; skipping absent terms adds an exact 0.0, which
    # cannot change the IEEE result, so this fold is bit-equal to it
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("ti", "__c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["__c"],
            ).alias("score")
        )
    )


def text_index_topk(
    spark: SparkSession,
    store_dir: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """Top-k retrieval over ``text_index_scores``: (doc_id, score, rank),
    rank dense from 1 by (score desc, doc_id asc). ``k`` past the match
    set returns just the matches. The order-by + limit lowers to a
    TakeOrderedAndProject (per-partition heaps, never a global sort)."""
    scored = text_index_scores(
        spark, store_dir, terms, k1=k1, b=b, n_buckets=n_buckets
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    from pyspark.sql.window import Window

    return topk.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    )


def describe_text_index(spark: SparkSession, store_dir: str) -> dict:
    """Operational snapshot: corpus stats plus posting/term/file counts
    (one metadata-scale pass over the postings; no text is read)."""
    st = _stats_summary(spark, store_dir)
    p = read_store(spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA)
    agg = p.agg(
        F.count("*").alias("postings"),
        F.countDistinct("term").alias("terms"),
        F.countDistinct("bucket").alias("buckets"),
    ).collect()[0]
    return {
        "n_docs": st["n"],
        "sum_dl": st["s"],
        "postings": int(agg["postings"]),
        "terms": int(agg["terms"]),
        "buckets": int(agg["buckets"]),
    }


def text_index_topk_many(
    spark: SparkSession,
    store_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    max_df_frac: float | None = None,
    max_query_terms: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Batch retrieval: top-k per query over the persisted index in ONE
    postings pass — the decontamination-by-search shape, where thousands
    of eval prompts probe the corpus at once.

    ``max_df_frac`` (None = exact BM25 over every query term) drops
    query terms whose document frequency exceeds that fraction of the
    corpus BEFORE scoring. A term in 20%+ of documents carries
    near-zero IDF but multiplies the contribution join by
    df × (queries containing it) — with full-document queries (the
    decontamination shape) the un-pruned join is effectively quadratic
    and measured-unrunnable at sf10 (r13). ``max_query_terms`` (None =
    all surviving terms) additionally keeps only each query's N
    RAREST surviving terms (smallest df, ties by term) — rare-term
    probing, the standard decontamination-by-search design: it bounds
    the contribution join at queries × N × df_cap BY CONSTRUCTION,
    instead of hoping the vocabulary is Zipf-shaped. Scores under
    either pruning are NOT bit-equal to ``bm25_scores`` with the full
    term list — they are BM25 over the surviving (informative) terms;
    queries whose terms are all pruned produce no rows.

    ``queries_df`` is (query_id, terms array<string>) and MODEL-SIZED by
    contract (it is collected once for routing and broadcast back for
    scoring — same discipline as every dim side in the engine). The
    postings scan is pruned to the UNION of all queried terms' buckets
    and terms; a term shared by multiple queries joins each of them, so
    its postings are read ONCE regardless of how many queries carry it.
    Per (query, doc) contributions fold in that query's term order, so
    each query's scores are bit-equal to ``text_index_scores`` (and
    hence to ``bm25_scores``) run alone with the same terms — pinned in
    tests/test_text_index.py. The per-query top-k is a
    rank-window (WindowGroupLimit keeps ~k rows per query ahead of the
    one query-keyed exchange).

    Output: (query_id, doc_id, score, rank), rank 1..k per query by
    (score desc, doc_id asc); queries whose terms are all absent from
    the corpus produce no rows. ``round_digits`` rounds scores BEFORE
    ranking (the similarity operators' engine-portability convention):
    an external oracle recomputing the same scores can land 1 ulp away
    on libm boundaries, and ranking on the rounded value keeps the
    top-k cut and rank order comparable across engines."""
    qrows = queries_df.select(
        F.col(query_id_col).alias("qid"), F.col(terms_col).alias("qterms")
    ).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id BIGINT, doc_id BIGINT, score DOUBLE, rank INT"
        )
    seen_qids: set[int] = set()
    qmeta_py: list[tuple] = []
    all_terms: set[str] = set()
    for r in qrows:
        qid = int(r["qid"])
        if qid in seen_qids:
            # two rows under one id would silently blend their term
            # lists into a fold neither query asked for
            raise ValueError(f"text_index_topk_many: duplicate query_id {qid}")
        seen_qids.add(qid)
        terms = list(r["qterms"] or [])
        if not terms:
            raise ValueError(f"text_index_topk_many: empty query {qid}")
        if len(set(terms)) != len(terms):
            raise ValueError(
                f"text_index_topk_many: duplicate terms in query {qid}"
            )
        for pos, t in enumerate(terms):
            qmeta_py.append((qid, pos, t))
            all_terms.add(t)

    st = _stats_summary(spark, store_dir)
    n_docs = st["n"]
    avgdl = float(st["s"]) / float(n_docs) if n_docs else 0.0
    if n_docs == 0 or avgdl == 0.0:
        return spark.createDataFrame(
            [], "query_id BIGINT, doc_id BIGINT, score DOUBLE, rank INT"
        )
    nb = st["nb"]

    term_list = sorted(all_terms)
    tdf = spark.createDataFrame(
        [(t,) for t in term_list], "term STRING"
    ).select("term", _bucket_of(F.col("term"), nb).alias("bucket"))
    needed = sorted({r["bucket"] for r in tdf.collect()})
    scan = read_store(
        spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
    ).filter(F.col("bucket").isin(needed))
    # term pruning: a literal IN pushes to the parquet footer and is the
    # fastest path for query-sized term sets, but a batch of thousands
    # of queries can union tens of thousands of distinct terms — a
    # 50k-element In() expression stalled planning/codegen for minutes
    # (r13, 2000-doc decontamination probe). Above the threshold the
    # term filter becomes a broadcast semi-join against the (probe-
    # sized) term table: bucket pruning still hits the footer, the term
    # prune moves to the hash join.
    if len(term_list) <= 1024:
        scan = scan.filter(F.col("term").isin(term_list))
    else:
        scan = scan.join(
            F.broadcast(tdf.select("term")), "term", "left_semi"
        )
    post = _live_postings(
        spark,
        store_dir,
        scan.distinct(),  # crashed-replay duplicate rows score once
        # (see text_index_scores)
    )
    dfs = {r["term"]: r["df"] for r in
           post.groupBy("term").agg(F.count("*").alias("df")).collect()}
    if max_df_frac is not None:
        cutoff = float(max_df_frac) * float(n_docs)
        surviving = {t for t, df in dfs.items() if df <= cutoff}
        qmeta_py = [
            (qid, pos, t) for qid, pos, t in qmeta_py if t in surviving
        ]
    if max_query_terms is not None:
        # out-of-vocabulary terms (df == 0) can never contribute to any
        # score, but they sort FIRST under the rarest-N key and would
        # crowd genuinely rare shared terms out of the probe budget — a
        # query with >= max_query_terms OOV tokens would probe only
        # no-op terms and retrieve nothing. Dropping them is strictly
        # recall-improving and score-neutral.
        by_q: dict = {}
        for qid, pos, t in qmeta_py:
            df = dfs.get(t, 0)
            if df == 0:
                continue
            by_q.setdefault(qid, []).append((df, t, pos))
        qmeta_py = [
            (qid, pos, t)
            for qid, entries in by_q.items()
            for _df, t, pos in sorted(entries)[:max_query_terms]
        ]
    if max_df_frac is not None or max_query_terms is not None:
        if not qmeta_py:
            return spark.createDataFrame(
                [], "query_id BIGINT, doc_id BIGINT, score DOUBLE, rank INT"
            )
        # re-prune the postings to the surviving terms so the dropped
        # terms' (large) posting lists never reach the contribution join
        surv_list = sorted({t for _qid, _pos, t in qmeta_py})
        if len(surv_list) <= 1024:
            post = post.filter(F.col("term").isin(surv_list))
        else:
            post = post.join(
                F.broadcast(
                    spark.createDataFrame(
                        [(t,) for t in surv_list], "term STRING"
                    )
                ),
                "term",
                "left_semi",
            )
    qmeta = spark.createDataFrame(
        [(qid, pos, t, float(dfs.get(t, 0))) for qid, pos, t in qmeta_py],
        "qid BIGINT, qpos INT, term STRING, df DOUBLE",
    )
    n_lit = F.lit(float(n_docs))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(1.0 + (n_lit - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = tf + k1 * (1.0 - b + b * dl / F.lit(avgdl))
    contrib = post.join(F.broadcast(qmeta), "term").select(
        "qid",
        F.col("doc_id"),
        F.col("qpos"),
        (idf * tf * (k1 + 1.0) / denom).alias("__c"),
    )
    scored = contrib.groupBy("qid", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("qpos", "__c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__c"],
        ).alias("score")
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"), "doc_id", "score", "rank"
        )
    )


def verify_text_index(spark: SparkSession, store_dir: str) -> dict:
    """Integrity probe for the two-write append: each ingest appends the
    postings FIRST and the stats row SECOND, so a crash between the two
    leaves the last batch's postings present but uncounted in N/Σdl —
    every subsequent score would use drifted corpus statistics. This
    check is one-sided but decisive for that failure: with consistent
    appends, distinct doc_ids in the postings can never EXCEED stats
    n_docs (tokenless docs only push the inequality the other way), so
    ``distinct_doc_ids > n_docs`` proves an orphaned postings batch.
    Returns the counts and a boolean; on ``consistent=False`` the remedy
    is to rebuild the store (re-appending the lost batch would
    double-count its postings — ids are unique-once by contract).
    Crashed DELETES, by contrast, are repairable and repaired here
    first (``_repair_crashed_deletes``)."""
    _repair_crashed_deletes(spark, store_dir)
    n_docs = _stats_summary(spark, store_dir)["n"]
    # live view: tombstoned docs are excluded from BOTH sides of the
    # inequality (their stats rows were already subtracted at delete)
    posted = (
        _live_postings(
            spark,
            store_dir,
            read_store(
                spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
            ),
        )
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()[0]
    )
    distinct_docs = int(posted["d"] or 0)
    # forward completeness: every live posted doc must have its forward
    # row (a store built before the forward substore, or a crash between
    # the postings and forward writes, leaves a gap — repair with
    # backfill_forward_index)
    fwd_docs = int(
        read_store(spark, f"{store_dir}/{_FORWARD}", schema=_FORWARD_SCHEMA)
        .join(
            F.broadcast(
                read_store(
                    spark, f"{store_dir}/{_TOMBSTONES}",
                    schema=_TOMBSTONES_SCHEMA,
                ).select("doc_id").distinct()
            ),
            "doc_id",
            "left_anti",
        )
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()[0]["d"]
        or 0
    )
    return {
        "n_docs": n_docs,
        "distinct_posted_docs": distinct_docs,
        "forward_docs": fwd_docs,
        "forward_complete": fwd_docs >= distinct_docs,
        "consistent": distinct_docs <= n_docs and fwd_docs >= distinct_docs,
    }


_TOMBSTONES = "tombstones"
# del_key: the delete's commit marker, mirrored into the stats ledger's
# batch_key column AFTER the tombstones land — a tombstoned del_key with
# no matching stats row is a crashed delete, repaired (from the dl each
# tombstone carries) at the start of the next delete or verify.
_TOMBSTONES_SCHEMA = "doc_id BIGINT, dl BIGINT, del_key STRING"


def _repair_crashed_deletes(spark: SparkSession, store_dir: str) -> int:
    """Append the missing negative stats row for any delete that crashed
    between its tombstone write and its stats write. Idempotent and
    cheap: key sets are ledger-sized."""
    tomb = read_store(
        spark, f"{store_dir}/{_TOMBSTONES}", schema=_TOMBSTONES_SCHEMA
    )
    st = _stats_summary(spark, store_dir)
    # anti-join FIRST, collect only the difference: the collected set is
    # bounded by crashed deletes (normally empty), not by ledger history
    missing = sorted(
        r["batch_key"]
        for r in tomb.select(F.col("del_key").alias("batch_key"))
        .filter(F.col("batch_key").isNotNull())
        .distinct()
        .join(_marker_keys_df(spark, store_dir), "batch_key", "left_anti")
        .collect()
    )
    for key in missing:
        adj = (
            tomb.filter(F.col("del_key") == key)
            .select("doc_id", "dl")
            .distinct()
            .agg(F.count("*").alias("k"), F.sum("dl").alias("s"))
            .collect()[0]
        )
        append_to_store(
            spark.createDataFrame(
                [(-int(adj["k"]), -int(adj["s"] or 0), st["nb"], key)],
                _STATS_SCHEMA,
            ),
            f"{store_dir}/{_STATS}",
        )
    return len(missing)


def delete_from_text_index(
    spark: SparkSession,
    store_dir: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> int:
    """Logical deletion: tombstone document ids so probes exclude them —
    the removal path for dedup-driven drops and takedown requests
    against a standing index, without rewriting the clustered postings.

    Ids already tombstoned (or never ingested — postings-free AND
    unknown) are ignored, so deletes are idempotent under replay and a
    double delete cannot double-adjust the statistics. The corpus stats
    shrink via a NEGATIVE stats row (−n_docs, −Σdl) computed from the
    tombstoned ids' own postings. The tombstones land FIRST carrying a
    deterministic ``del_key``; the stats row mirrors that key as its
    commit marker, so a crash between the two writes is detected and
    repaired (``_repair_crashed_deletes`` — each tombstone carries its
    dl) on the next delete or ``verify_text_index`` call, keeping
    post-delete probe scores bit-equal to ``bm25_scores`` over the
    surviving corpus through every crash point (pinned in
    tests/test_text_index.py). Physical purge = ``vacuum_text_index``.
    NOTE: a tokenless-but-ingested doc has no postings to prove
    ingestion, so deleting it adjusts nothing — its dl is 0 (harmless to
    Σdl) but its N slot survives; track tokenless ids caller-side if
    exact-N deletion of empty docs matters.

    Returns the number of ids newly tombstoned."""
    _repair_crashed_deletes(spark, store_dir)
    st = _stats_summary(spark, store_dir)
    if st["nb"] is None:
        raise ValueError(
            f"delete_from_text_index: no committed appends at {store_dir}"
        )
    req = ids.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    prior = read_store(
        spark, f"{store_dir}/{_TOMBSTONES}", schema=_TOMBSTONES_SCHEMA
    ).select("doc_id")
    fresh = req.join(prior, "doc_id", "left_anti").localCheckpoint()
    # ONE semi-join against the (doc-unprunable) postings serves the
    # adjustment aggregate AND the tombstone rows; dl rides every posting
    # of a doc, so the per-doc distinct is exact
    post = read_store(
        spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
    )
    deletable = (
        post.join(F.broadcast(fresh), "doc_id", "left_semi")
        .select("doc_id", "dl")
        .distinct()
        .localCheckpoint()
    )
    adj = deletable.agg(
        F.count("*").alias("k"),
        F.sum("dl").alias("s"),
        # bit_xor, not sum: an order-independent digest of the DISTINCT
        # id set that cannot hit ANSI long overflow (a plain sum of
        # xxhash64 values aborts after a handful of rows)
        F.expr("bit_xor(xxhash64(doc_id))").alias("h"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    n_del = int(adj["k"] or 0)
    if n_del == 0:
        return 0
    # deterministic over the id set → a replay of the same crashed
    # request converges on the same marker
    del_key = f"del-{n_del}-{int(adj['h'])}-{int(adj['lo'])}-{int(adj['hi'])}"
    # fully committed by an earlier attempt
    if _has_marker_key(spark, store_dir, del_key):
        return 0
    append_to_store(
        deletable.withColumn("del_key", F.lit(del_key)),
        f"{store_dir}/{_TOMBSTONES}",
    )
    append_to_store(
        spark.createDataFrame(
            [(-n_del, -int(adj["s"] or 0), st["nb"], del_key)], _STATS_SCHEMA
        ),
        f"{store_dir}/{_STATS}",
    )
    return n_del


def _live_postings(spark: SparkSession, store_dir: str, pruned: DataFrame):
    """Anti-join the pruned postings against the tombstone set (empty →
    no-op plan). The broadcast hint is size-gated on the tombstone
    store's on-disk bytes (filesystem metadata, no extra job): deletes
    are billed as the removal path for dedup-driven drops, which can be
    a large corpus fraction between vacuums, and an oversized set must
    shuffle instead of shipping to every executor — same discipline as
    the ANN store's ``_live_vectors``. (The byte count spans kept store
    versions, so it over-estimates by ≤ the KEEP_PREVIOUS factor —
    conservative in the safe direction for a broadcast gate.)"""
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        _dir_bytes,
        _BROADCAST_TOMB_BYTES,
    )

    tomb = read_store(
        spark, f"{store_dir}/{_TOMBSTONES}", schema=_TOMBSTONES_SCHEMA
    ).select("doc_id").distinct()
    if _dir_bytes(spark, f"{store_dir}/{_TOMBSTONES}") <= _BROADCAST_TOMB_BYTES:
        tomb = F.broadcast(tomb)
    return pruned.join(tomb, "doc_id", "left_anti")


def vacuum_text_index(
    spark: SparkSession,
    store_dir: str,
    retire_keys_where: str | None = None,
) -> int:
    """Physically purge the index: commit a postings version holding
    only live, de-duplicated rows (tombstoned docs and crashed-replay
    duplicates gone), collapse the stats ledger to one summed row PLUS
    one zero-row per commit-marker key, and clear the tombstones. Probe
    results are unchanged (the logical view was already
    live-and-distinct); what changes is the storage — scans stop paying
    the anti-join input and the duplicate rows.

    Marker keys are PRESERVED by default (as zero-valued ledger rows):
    they are what makes append/delete replays idempotent, and dropping
    them would let an at-least-once replay of a pre-vacuum batch
    double-count its stats after the vacuum. For a long-lived stream
    (one marker per micro-batch) the ledger would otherwise grow
    forever, so ``retire_keys_where`` — a SQL predicate over
    ``batch_key`` — retires matching markers during the collapse.
    SAFETY CONTRACT: only retire keys that can NEVER be replayed again,
    i.e. below the source's committed replay horizon (e.g.
    ``"batch_key like 'a1b2c3d4-%' and
    cast(substring_index(batch_key, '-', -1) as bigint) < 100"`` for a
    stream checkpoint already committed past batch 100 — replays of
    earlier batches are impossible once the checkpoint has advanced).
    Retiring a still-replayable key converts its replay into a
    double-count. A key is retired only when the predicate evaluates to
    exactly TRUE — keys where it evaluates to NULL (e.g. a try_cast on
    a non-conforming key) are KEPT, erring on the safe side of the
    contract. Crash-safe at every boundary: crashed deletes are
    repaired first; the postings commit is logically identical to the
    live view; the stats commit preserves both sums and (non-retired)
    keys; stale tombstones against purged postings anti-join to a no-op
    until the final clear. Returns posting rows removed."""
    from hrdp_variant_load_pipeline_spark.sources.store import (
        _fs,
        _jpath,
        commit_store_version,
    )

    _repair_crashed_deletes(spark, store_dir)
    post = read_store(
        spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
    )
    n_before = post.count()
    live = _live_postings(spark, store_dir, post.distinct())
    live = live.repartitionByRange("bucket", "term").sortWithinPartitions(
        "bucket", "term"
    )
    commit_store_version(live.localCheckpoint(), f"{store_dir}/{_POSTINGS}")
    n_after = read_store(
        spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
    ).count()

    # forward substore: same live-and-distinct purge, clustered on
    # doc_id (tombstone anti-join rides _live_postings' size-gated
    # broadcast discipline via the same gate)
    from hrdp_variant_load_pipeline_spark.operators.ann_store import (
        _dir_bytes,
        _BROADCAST_TOMB_BYTES,
    )

    tomb_ids = read_store(
        spark, f"{store_dir}/{_TOMBSTONES}", schema=_TOMBSTONES_SCHEMA
    ).select("doc_id").distinct()
    if _dir_bytes(spark, f"{store_dir}/{_TOMBSTONES}") <= _BROADCAST_TOMB_BYTES:
        tomb_ids = F.broadcast(tomb_ids)
    fwd_live = (
        read_store(spark, f"{store_dir}/{_FORWARD}", schema=_FORWARD_SCHEMA)
        .distinct()
        .join(tomb_ids, "doc_id", "left_anti")
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
    )
    commit_store_version(fwd_live.localCheckpoint(), f"{store_dir}/{_FORWARD}")

    st = _stats_summary(spark, store_dir)
    if st["nb"] is not None:  # no stats ledger -> nothing to collapse
        # the marker rows are built DISTRIBUTEDLY (select over the
        # ledger, not a driver collect of every key — the ledger can be
        # micro-batch-count-sized for a long stream), unioned with the
        # one summed total row
        keys = _marker_keys_df(spark, store_dir)
        if retire_keys_where is not None:
            # retire ONLY on predicate IS TRUE: a NULL evaluation (e.g.
            # try_cast on a non-conforming key) must KEEP the marker —
            # `NOT (pred)` would drop NULL-predicate keys too, and per
            # the safety contract retiring a still-replayable key turns
            # its replay into a stats double-count
            keys = keys.filter(
                ~F.expr(retire_keys_where).eqNullSafe(F.lit(True))
            )
        marker_rows = keys.select(
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("sum_dl"),
            F.lit(st["nb"]).cast("long").alias("n_buckets"),
            F.col("batch_key"),
        )
        total_row = spark.createDataFrame(
            [(st["n"], st["s"], st["nb"], None)], _STATS_SCHEMA
        )
        commit_store_version(
            total_row.unionByName(marker_rows).localCheckpoint(),
            f"{store_dir}/{_STATS}",
        )
    fs, jvm = _fs(spark, store_dir)
    tpath = _jpath(jvm, f"{store_dir}/{_TOMBSTONES}")
    if fs.exists(tpath):
        fs.delete(tpath, True)
    return int(n_before - n_after)


# ---------------------------------------------------------- forward index
# doc → term-vector substore: the complement of the inverted postings.
# Clustered by doc_id, so an `id IN (...)` fetch prunes at the parquet
# footer — per-document term vectors in O(requested docs), the access
# path pseudo-relevance feedback and doc-similarity need (the inverted
# postings are (bucket, term)-clustered; a doc-keyed filter over them
# cannot prune and would scan the store).
_FORWARD = "forward"
_FORWARD_SCHEMA = (
    "doc_id BIGINT, terms ARRAY<STRING>, tfs ARRAY<BIGINT>, dl BIGINT"
)


def doc_vectors(
    spark: SparkSession,
    store_dir: str,
    ids: DataFrame | list[int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Fetch (doc_id, terms, tfs, dl) for the requested ids from the
    forward substore — `doc_id IN` pushed to the clustered scan, so cost
    is O(requested docs' rows), never O(corpus). The id set is
    REQUEST-SIZED by contract: a DataFrame argument is collected to the
    driver (``id_col`` names its id column) and routed through the same
    static IN filter as a list, so both forms get footer pruning.
    Tombstoned docs are excluded; crashed-replay duplicate rows collapse
    via distinct (rows of a replayed batch are identical: terms sort by
    term). Ids absent from the substore (never ingested, tokenless,
    deleted — or ingested by a pre-forward build, see
    ``backfill_forward_index``) produce no row."""
    if isinstance(ids, DataFrame):
        ids = [
            int(r[0])
            for r in ids.select(F.col(id_col).cast("long")).collect()
        ]
    fwd = read_store(
        spark, f"{store_dir}/{_FORWARD}", schema=_FORWARD_SCHEMA
    ).filter(F.col("doc_id").isin([int(i) for i in ids]))
    tomb = read_store(
        spark, f"{store_dir}/{_TOMBSTONES}", schema=_TOMBSTONES_SCHEMA
    ).select("doc_id")
    return fwd.join(F.broadcast(tomb.distinct()), "doc_id", "left_anti").distinct()


def backfill_forward_index(spark: SparkSession, store_dir: str) -> int:
    """Build (or rebuild) the forward substore FROM the live postings —
    the migration path for indexes created before the forward substore
    existed, and the repair path when ``verify_text_index`` reports
    ``forward_complete=False``. One postings pass (the same doc-keyed
    rollup an append performs), committed as a fresh forward version.
    Returns the number of forward rows committed."""
    from hrdp_variant_load_pipeline_spark.sources.store import (
        commit_store_version,
    )

    live = _live_postings(
        spark,
        store_dir,
        read_store(
            spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA
        ).distinct(),
    )
    fwd = (
        live.groupBy("doc_id", "dl")
        .agg(F.sort_array(F.collect_list(F.struct("term", "tf"))).alias("__p"))
        .select(
            "doc_id",
            F.transform("__p", lambda p: p["term"])
            .cast("array<string>")
            .alias("terms"),
            F.transform("__p", lambda p: p["tf"])
            .cast("array<bigint>")
            .alias("tfs"),
            "dl",
        )
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
        .localCheckpoint()
    )
    commit_store_version(fwd, f"{store_dir}/{_FORWARD}")
    return fwd.count()


def prf_expand_terms(
    spark: SparkSession,
    store_dir: str,
    terms: list[str],
    k_docs: int = 10,
    n_expand: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_candidates: int = 256,
) -> list[str]:
    """Pseudo-relevance feedback (Rocchio/RM3 family): expand a query
    with the most informative terms of its own top-k documents, entirely
    from the index — (1) inverted top-k probe, (2) forward fetch of the
    k winners' term vectors (id pushdown, O(k) rows), (3) one pruned
    inverted probe for the candidate terms' dfs, (4) rank candidates by
    feedback-tf × idf. The original terms are excluded; ties break to
    the lexicographically smaller term, so expansion is deterministic.
    Returns ``terms + [up to n_expand new terms]``; an empty match set
    returns the original query unchanged. Requires the forward substore
    (built by every append; for a pre-forward store run
    ``backfill_forward_index`` once). ``max_candidates`` caps the
    feedback vocabulary taken into the df probe (pre-ranked by feedback
    tf, ties to the smaller term): long documents would otherwise push
    thousands of term literals into the probe's IN filter, past the
    point where the scan can prune."""
    st = _stats_summary(spark, store_dir)
    nb = st["nb"] if st["nb"] is not None else 64
    top = text_index_topk(spark, store_dir, terms, k=k_docs, k1=k1, b=b)
    ids = [int(r["doc_id"]) for r in top.select("doc_id").collect()]
    if not ids:
        return list(terms)
    fb_rows = (
        doc_vectors(spark, store_dir, ids)
        .select(F.explode(F.arrays_zip("terms", "tfs")).alias("z"))
        .select(
            F.col("z.terms").alias("term"), F.col("z.tfs").alias("tf")
        )
        .filter(~F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.sum("tf").alias("fb_tf"))
        .orderBy(F.desc("fb_tf"), F.asc("term"))
        .limit(max_candidates)
        .collect()  # request-sized: <= max_candidates rows
    )
    if not fb_rows:
        return list(terms)
    fb = spark.createDataFrame(
        [(r["term"], int(r["fb_tf"])) for r in fb_rows],
        "term STRING, fb_tf BIGINT",
    )
    cands = [r["term"] for r in fb_rows]
    cdf = spark.createDataFrame([(t,) for t in cands], "term STRING").select(
        "term", _bucket_of(F.col("term"), nb).alias("bucket")
    )
    needed = sorted({r["bucket"] for r in cdf.collect()})
    dfs = _live_postings(
        spark,
        store_dir,
        read_store(spark, f"{store_dir}/{_POSTINGS}", schema=_POSTINGS_SCHEMA)
        .filter(F.col("bucket").isin(needed))
        .filter(F.col("term").isin(cands))
        .distinct(),
    ).groupBy("term").agg(F.count("*").alias("df"))
    n_lit = F.lit(float(st["n"]))
    scored = fb.join(dfs, "term").select(
        "term",
        (
            F.col("fb_tf").cast("double")
            * F.log(
                1.0
                + (n_lit - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
            )
        ).alias("w"),
    )
    picked = (
        scored.orderBy(F.desc("w"), F.asc("term")).limit(n_expand).collect()
    )
    return list(terms) + [r["term"] for r in picked]
