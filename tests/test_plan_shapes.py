"""Physical-plan regression guards: pushdown, broadcast selection, and
absence of scale smells. These pin the plans the engine is DESIGNED to
produce — a correctness-preserving change that degrades one of these
shapes is a perf regression at 100 TB even if every value still matches."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def _plan(spark, name, sf=None):
    df = QUERIES[name](spark, sf or SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan and "GreaterThan" in plan
    # column pruning: the 16-col table is read with only the needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_nation_volume"])
def test_star_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the fact table must NEVER be the broadcast/build side: a size
    # ESTIMATE dipping under the threshold (3-column pruned scan at ~sf1)
    # must not let the planner ship lineitem to every executor
    import re

    assert not re.search(r"BroadcastExchange[\s\S]{0,1200}?lineitem", plan)


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_nation_volume"])
def test_fact_join_is_partitioned_hash(spark, name):
    """q3 reduces orders through the broadcast customer filter FIRST (and
    q5 collapses the region→nation→supplier chain into lineitem first),
    then probes the fact join as a partitioned (shuffled) hash join — the
    shape that survives 100 TB where a fact-side broadcast cannot."""
    plan = _plan(spark, name)
    assert "ShuffledHashJoin" in plan


def test_insert_if_absent_single_shuffle_no_join(spark):
    """Both sides derive from one table, so the plan must be a single
    hash-aggregate over one scan: exactly one exchange (the pair-key
    shuffle, with map-side partial agg), no join operator at all — the
    round-2 form paid two distinct shuffles plus an anti-join."""
    plan = _plan(spark, "insert_if_absent")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_exists_flag_single_probe_scan_no_probe_shuffle(spark):
    """The genic exists-flag must scan its probe side exactly ONCE (the
    round-1 semi ∪ anti form scanned it twice) and must not shuffle probe
    rows; the only exchange is the dimension-side per-chromosome
    aggregate + its broadcast."""
    from hrdp_variant_load_pipeline_spark.operators.interval_join import (
        with_exists_flag,
    )

    probes = spark.range(98765).selectExpr(
        "'1' AS chromosome", "id * 10 AS q_start", "id * 10 + 5 AS q_stop"
    )
    iv = spark.range(10).selectExpr(
        "'1' AS chromosome", "id * 100 AS start_pos", "id * 100 + 50 AS stop_pos"
    )
    plan = (
        with_exists_flag(probes, iv, "hit")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one scan of the probe relation
    assert plan.count("Range (0, 98765") == 1
    assert "BroadcastExchange" in plan
    # any hash exchange belongs to the 10-row dimension aggregate, never
    # to the probe side: the probe Range must not sit under an exchange
    for section in plan.split("Exchange hashpartitioning")[1:]:
        first_range = next(
            (ln for ln in section.splitlines() if "Range (" in ln), ""
        )
        assert "Range (0, 98765" not in first_range


def test_minhash_no_cartesian(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan


def test_events_agg_partial_before_shuffle(spark):
    """Map-side partial aggregation must precede the exchange."""
    plan = _plan(spark, "events_tumbling_counts")
    pre, _, post = plan.partition("Exchange hashpartitioning")
    assert "HashAggregate" in pre and "HashAggregate" in post


_ = os  # keep import-sorted helpers referenced


def test_merge_update_no_forced_broadcast_hint(spark):
    """merge_update must not FORCE-broadcast the update side: an update set
    can approach store size (genic-QC drift after a gene refresh), and a
    forced broadcast of an unbounded side OOMs at scale regardless of
    statistics. The logical plan must carry no broadcast hint — the
    strategy choice stays with Catalyst/AQE and its size estimates (which
    may legitimately still pick broadcast for small sets)."""
    from hrdp_variant_load_pipeline_spark.operators.upsert import merge_update

    store = spark.range(1000).selectExpr("id AS k", "'OLD' AS status")
    updates = spark.range(1000).selectExpr("id AS k", "'NEW' AS status")
    merged = merge_update(store, updates, "k", ["status"])
    logical = merged._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical
    # control: a genuinely hinted frame does show the marker, so the
    # assertion above is meaningful
    from pyspark.sql import functions as SF

    hinted = store.join(SF.broadcast(updates), "k", "left")
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()


def test_simhash_no_explode_no_shuffle(spark):
    """SimHash is a row-local aggregate/zip_with fold: the plan must
    contain no Generate (explode) and no exchange at all."""
    from hrdp_variant_load_pipeline_spark.operators import dedup as DD
    from hrdp_variant_load_pipeline_spark.sources.tables import table

    df = DD.simhash(table(spark, SF_DIR, "documents"), "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "Exchange" not in plan


def test_ivf_assignment_no_corpus_shuffle(spark):
    """IVF bucket assignment must be row-local: the corpus is never
    shuffled to pick each vector's nearest centroid (the window-based
    form exchanged the FULL corpus — embedding vectors included — 8x
    replicated). The only hash exchange allowed is the final per-query
    top-k rank."""
    plan = _plan(spark, "embedding_ivf_topk")
    assert plan.count("Exchange hashpartitioning") == 1
    # and that one exchange is the per-query rank, prefixed by a partial
    # WindowGroupLimit so only ~k rows per group reach the shuffle
    pre, _, _ = plan.partition("Exchange hashpartitioning")
    assert "WindowGroupLimit" in pre


def test_agg_distinct_single_scan_expand_codegen(spark):
    """The fused battery must read lineitem ONCE: a GROUPING SETS Expand
    feeding a codegen HashAggregate (map-side partial), never the 3-pass
    join-of-subaggregations form (3 scans) or a mixed agg that drops the
    Expand into an interpreted ObjectHashAggregate at level 1."""
    plan = _plan(spark, "agg_distinct_battery")
    assert plan.count("FileScan parquet") == 1, "lineitem must be scanned once"
    assert "Expand" in plan
    assert "Join" not in plan
    # level 1 (below the Expand) is a plain codegen HashAggregate on the
    # grouping-set keys; the percentile/HLL ObjectHashAggregate runs at
    # level 2 over the tiny combination table — after the only exchange
    assert "HashAggregate(keys=[l_returnflag" in plan


def test_brute_force_topk_single_corpus_pass_broadcast_queries(spark):
    """The JVM HOF form (the zero-Python path and the BLAS form's parity
    oracle): corpus scanned once, query side broadcast, no shuffle
    before the per-query rank window."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators import similarity as SIM
    from hrdp_variant_load_pipeline_spark.sources.tables import table

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    df = SIM.brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # cross join vs broadcast NESTED loop
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the rank window only


def test_brute_force_topk_blas_shape(spark):
    """The Arrow/BLAS form (the driver row's large-corpus arm since the
    r14 size-gated dispatch): corpus scanned once through ONE
    mapInPandas (queries ride the closure, no join at all); the only
    exchange is the per-query rank window over the per-batch partial
    top-k rows. At the tiny test SF the DRIVER ROW dispatches to the
    JVM form (no Python stage at all) — pinned here too."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators import similarity as SIM
    from hrdp_variant_load_pipeline_spark.sources.tables import table

    small = _plan(spark, "embedding_cosine_topk")
    assert "MapInPandas" not in small  # tiny corpus -> JVM fast path
    e = table(spark, SF_DIR, "embeddings")
    df = SIM.brute_force_topk_auto(
        e, e.filter(F.col("vec_id") < 10), k=5, blas_threshold=1
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the rank window only


def test_incremental_dedup_history_probe_is_candidate_pruned(spark, tmp_path):
    """The incremental dedup verify stage must fetch historical shingles
    through a broadcast LEFT-SEMI join against the (batch-sized)
    candidate id set — never distinct/shuffle the full index's (doc, sh)
    rows. The index-side shingle scan must feed the semi filter DIRECTLY
    (no Exchange between scan and filter): this is the O(batch), not
    O(history), per-ingest-batch contract."""
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        banded_signatures,
        incremental_minhash_dedup,
    )

    hist = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(101, "a b c d e f g"), (102, "z y x w v u t")],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "idx")
    banded_signatures(hist, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    out = incremental_minhash_dedup(
        batch, index, "doc_id", "text", materialize=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 1
    # locate the index shingle scan (the only FileScan reading sh)
    sh_scan = plan.find("sh:array<string>")
    assert sh_scan != -1, "index shingle scan missing from plan"
    above = plan[max(0, sh_scan - 600) : sh_scan]
    # scan -> (null filter) -> broadcast semi: nothing else in between —
    # in particular no Exchange and no full-index distinct aggregate
    assert "BroadcastHashJoin" in above and "LeftSemi" in above
    seg = above[above.find("LeftSemi") :]
    assert "Exchange" not in seg and "HashAggregate" not in seg


def test_incremental_dedup_band_join_broadcasts_probe_side(spark, tmp_path):
    """The band join must broadcast the BATCH probe side (BuildLeft), not
    the index: the planner sizes the parquet index but not the derived
    probe plan, and an index-side broadcast grows with history forever."""
    import re

    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        banded_signatures,
        incremental_minhash_dedup,
    )

    hist = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(101, "a b c d e f g")], "doc_id long, text string"
    )
    idx_path = str(tmp_path / "idx")
    banded_signatures(hist, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    out = incremental_minhash_dedup(
        batch, index, "doc_id", "text", materialize=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    band_joins = re.findall(
        r"BroadcastHashJoin \[band_idx#\d+, band_val#\d+\].*", plan
    )
    assert band_joins, "band join missing or not a broadcast join"
    # the index-probing band join (right side carries doc_dup from the
    # index) must build from the LEFT (broadcast probe)
    assert any("BuildLeft" in j for j in band_joins), band_joins


def test_spread_for_cpu_noop_on_wide_scans(spark):
    """spread_for_cpu must never insert a shuffle when the plan already
    has enough partitions (the real-cluster case)."""
    from hrdp_variant_load_pipeline_spark.sources.tables import spread_for_cpu

    wide = spark.range(0, 1000, 1, 16).selectExpr("id", "id * 2 AS v")
    assert spread_for_cpu(wide, parts=8) is wide
    narrow = spark.range(0, 1000, 1, 1)
    spreaded = spread_for_cpu(narrow, parts=8)
    assert spreaded is not narrow
    assert "Exchange" in spreaded._jdf.queryExecution().executedPlan().toString()


def test_spread_for_cpu_file_scan_estimate_matches_rdd(spark):
    """The file-stat partition estimate (no plan-to-RDD conversion) must
    agree with the RDD probe on real parquet scans: single-split testdata
    repartitions, and a many-file input is left alone."""
    from hrdp_variant_load_pipeline_spark.sources.tables import (
        _estimated_scan_partitions,
        spread_for_cpu,
        table,
    )

    import os as _os

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    est = _estimated_scan_partitions(docs)
    assert est is not None
    assert est == docs.rdd.getNumPartitions()
    # multi-file staging, if present on this host: estimate must still
    # agree with the RDD probe (packing arithmetic, not file count)
    sf1_li = "/root/repo/benchdata/sf1/lineitem.parquet"
    if _os.path.isdir(sf1_li):
        li = spark.read.parquet(sf1_li).select("l_orderkey")
        assert _estimated_scan_partitions(li) == li.rdd.getNumPartitions()
    spreaded = spread_for_cpu(docs, parts=8)
    assert spreaded is not docs  # single row-group file -> repaired
    # non-file frames fall back to the RDD probe, never crash
    assert _estimated_scan_partitions(spark.range(10)) is None
    # join-containing frames must NOT use the leaf-file estimate (it
    # would count every input's files — e.g. a batch anti-joined against
    # a big store would look wide); they fall back to the RDD probe
    joined = docs.join(
        table(spark, SF_DIR, "documents").select("doc_id"), "doc_id", "left_anti"
    )
    assert _estimated_scan_partitions(joined) is None


def test_scan_estimate_allowlist_fails_closed(spark):
    """The estimator qualifies plans by an allowlisted tree walk
    (Project/Filter/SubqueryAlias/View/LogicalRelation): every
    non-scan-stage operator — aggregate, window, sort, limit, union,
    distinct, repartition, generate — must fall back to the RDD probe
    (None), and a column NAMED like an operator must not scare a pure
    scan away (the old substring blocklist did both wrong)."""
    from pyspark.sql import Window, functions as F

    from hrdp_variant_load_pipeline_spark.sources.tables import (
        _estimated_scan_partitions,
        table,
    )

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    non_scan = [
        docs.groupBy("doc_id").count(),
        docs.withColumn(
            "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("text"))
        ),
        docs.orderBy("doc_id"),
        docs.limit(5),
        docs.union(docs),
        docs.distinct(),
        docs.repartition(4),
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")),
    ]
    for frame in non_scan:
        assert _estimated_scan_partitions(frame) is None, (
            frame._jdf.queryExecution().analyzed().toString().splitlines()[0]
        )
    # operator-looking NAMES must not disqualify a pure scan
    named = docs.select(
        F.col("doc_id").alias("Join"),
        F.col("text").alias("WindowSortLimit"),
    ).filter(F.col("Join") >= 0)
    est = _estimated_scan_partitions(named)
    assert est is not None and est == named.rdd.getNumPartitions()


def test_events_user_trend_is_pure_aggregate(spark):
    """The per-user OLS slope is covar_pop/var_pop — ONE map-side
    combinable hash aggregate. A FlatMapGroupsInPandas here would force
    every user's rows into one Python worker (hot keys straggle; no
    partial aggregation), so the plan must stay UDF-free."""
    # not registry-listed since the r15 consolidation (it rides
    # iterative_ts_battery as the 'utrend' components) — the plan
    # contract on the helper is unchanged
    from hrdp_variant_load_pipeline_spark.queries_ml import events_user_trend

    df = events_user_trend(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_semi_anti_shuffle_hash_no_sort_no_broadcast(spark):
    """r11 shape: both halves of join_semi_anti_tagged are shuffle-hash
    with the skinny key projection as build side — no sort-merge (sort
    cost), no broadcast (neither side broadcasts at 100 TB), and the
    anti build is pre-distincted (map-side combine bounds the shuffle
    by |customer keys|, not |orders|). Measured -22% median vs the
    unhinted shape (BENCH_NOTES r11)."""
    plan = _plan(spark, "join_semi_anti_tagged")
    assert plan.count("ShuffledHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # the anti build side carries a pre-aggregate (distinct o_custkey)
    assert "HashAggregate" in plan, plan


def test_pre_aggregated_join_plain_route_has_no_keyed_agg(spark):
    """mode="plain" must emit literal partials with NO aggregate below
    the join (the whole point of routing away from the rewrite), and
    mode="pre" must keep exactly the keyed pre-aggregate."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.skew import (
        pre_aggregated_join,
    )

    fact = spark.range(1000).selectExpr("id % 100 AS k", "id * 1.0 AS x")
    dim = spark.range(100).selectExpr("id AS k", "id AS tag")
    plain = pre_aggregated_join(
        fact, dim, ["k"], sum_cols=["x"], mode="plain", finishing=True
    )
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in pplan
    pre = pre_aggregated_join(fact, dim, ["k"], sum_cols=["x"], mode="pre")
    rplan = pre._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in rplan
    # route invariance of the finishing contract, one more time at the
    # plan level: both frames agree after the documented finish
    fin = lambda df: sorted(
        map(
            tuple,
            df.groupBy("tag")
            .agg(F.sum("n_rows").cast("long"), F.round(F.sum("sum_x"), 6))
            .collect(),
        )
    )
    assert fin(plain) == fin(pre)


def test_pair_jaccard_prunes_via_hot_anti_join(spark):
    """The df-prune must ANTI-join against the (Zipf-head-sized) HOT
    shingle set, never semi-join against the rare KEEP set: rare is
    nearly every shingle on real corpora (measured at the 100x staging:
    20,279,790 of 20,279,825), so a keep-side join gave the planner a
    corpus-sized build/broadcast side (1.5 GiB at sf10). Also pins the
    r16 sizes path: the per-doc set size comes from the row-local
    shingle array, so the plan carries exactly TWO corpus explodes
    (df-count branch + collect branch), not three."""
    from pyspark.sql import functions as F  # noqa: F401

    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail here") for i in range(30)],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, max_df=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    # corpus-shingle explodes (the pair-struct explode is also a
    # Generate, so count the shingle form specifically)
    assert plan.count("Generate explode(CASE WHEN") == 2, plan


def test_word_weighted_stats_udf_sees_vocabulary_not_corpus(spark):
    """The word_stats callable must receive the DISTINCT-word frame —
    one row per vocabulary word, never per token occurrence. Pinned by
    materializing what the callable was handed."""
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        word_weighted_stats,
    )

    df = spark.createDataFrame(
        [("en", "a a a b"), ("en", "a b c"), ("de", "a c")],
        "lang string, text string",
    )
    seen = {}

    def stats(words):
        rows = words.collect()
        seen["words"] = sorted(r["word"] for r in rows)
        return spark.createDataFrame(
            [(r["word"], len(r["word"])) for r in rows],
            "word string, n long",
        )

    out = word_weighted_stats(df, "text", ["lang"], stats)
    got = {r["lang"]: r for r in out.collect()}
    # 9 token occurrences, 3 distinct words — the UDF input is the vocab
    assert seen["words"] == ["a", "b", "c"]
    assert got["en"]["sum_n"] == 7.0 and got["de"]["sum_n"] == 2.0
