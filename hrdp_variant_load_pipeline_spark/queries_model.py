"""Warehouse/model-ops parity queries: SCD2 dimension versioning and the
model-operator wave (BPE apply, vocabulary building, data-quality
constraints, product-quantization ADC search) — each driver-gated against
an independently written DuckDB oracle.

Determinism strategy: everything data-dependent derives from the TPC-H-ish
tables; everything learned is FIXED (a literal BPE merge list, literal PQ
codebooks) so both engines compute identical values without replicating a
trainer in SQL. The BPE token-count closed form in the oracle (tokens =
len+1 − n_th − n_the for merges [(t,h),(th,e)]) was verified equal to the
iterative merge algorithm on the full corpus and a 20k random stress set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.sources.tables import table

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_NULL = "<null>"

# ------------------------------------------------------------------- scd2
# Two CDC batches derived from orders (era split at 1998-01-01): per
# customer, the winning (latest) order priority of each era becomes that
# era's update row. Merge 1 seeds an empty dimension; merge 2 closes /
# re-opens changed keys. The lookup then enriches a deterministic order
# sample with the priority valid AT its order date — orders earlier than
# their key's first version exercise the null-match path.
_SCD2_CUT = "1998-01-01"

_SCD2_SQL = f"""
WITH w1 AS (
  SELECT o_custkey, o_orderpriority AS p, o_orderdate AS ts FROM (
    SELECT o_custkey, o_orderpriority, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderpriority DESC) AS rn
    FROM orders WHERE o_orderdate < TIMESTAMP '{_SCD2_CUT}') WHERE rn = 1),
w2 AS (
  SELECT o_custkey, o_orderpriority AS p, o_orderdate AS ts FROM (
    SELECT o_custkey, o_orderpriority, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderpriority DESC) AS rn
    FROM orders WHERE o_orderdate >= TIMESTAMP '{_SCD2_CUT}') WHERE rn = 1),
hist AS (
  SELECT w1.o_custkey AS k, w1.p AS p, w1.ts AS f,
         CASE WHEN w2.o_custkey IS NOT NULL AND w2.p <> w1.p THEN w2.ts END AS t
  FROM w1 LEFT JOIN w2 ON w1.o_custkey = w2.o_custkey
  UNION ALL
  SELECT w2.o_custkey, w2.p, w2.ts, NULL
  FROM w2 LEFT JOIN w1 ON w1.o_custkey = w2.o_custkey
  WHERE w1.o_custkey IS NULL OR w1.p <> w2.p),
lk AS (
  SELECT o.o_orderkey, h.p, o.o_orderdate AS ts
  FROM orders o LEFT JOIN hist h
    ON o.o_custkey = h.k AND o.o_orderdate >= h.f
   AND (h.t IS NULL OR o.o_orderdate < h.t)
  WHERE o.o_orderkey % 17 = 0)
SELECT 'history' AS component, k, p AS v, f AS ts_a, t AS ts_b FROM hist
UNION ALL
SELECT 'lookup', o_orderkey, coalesce(p, '{_NULL}'), ts, NULL FROM lk
"""


@q("scd2_battery", _SCD2_SQL)
def scd2_battery(spark: SparkSession, sf: str) -> DataFrame:
    from hrdp_variant_load_pipeline_spark.operators.upsert import (
        scd2_lookup,
        scd2_merge,
    )

    o = table(spark, sf, "orders")
    cut = F.lit(_SCD2_CUT).cast("timestamp")
    empty = spark.createDataFrame(
        [],
        "o_custkey bigint, o_orderpriority string, "
        "effective_from timestamp, effective_to timestamp",
    )

    def updates(pred):
        return o.filter(pred).select(
            "o_custkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("batch_ts"),
        )

    # each merge output is materialized: scd2_merge's three filter
    # branches re-derive the full-outer join, and h2 feeds BOTH the
    # history rows and the lookup — unmaterialized, the chained plan
    # re-executed the orders scan 29 times (measured); checkpointed it
    # scans once per merge. This mirrors production, where each merge
    # lands in the dimension store before the next batch reads it.
    h1 = scd2_merge(
        empty, updates(F.col("o_orderdate") < cut), ["o_custkey"], ["o_orderpriority"]
    ).localCheckpoint()
    h2 = scd2_merge(
        h1, updates(F.col("o_orderdate") >= cut), ["o_custkey"], ["o_orderpriority"]
    ).localCheckpoint()
    hist_rows = h2.select(
        F.lit("history").alias("component"),
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("v"),
        F.col("effective_from").alias("ts_a"),
        F.col("effective_to").alias("ts_b"),
    )
    facts = o.filter(F.col("o_orderkey") % 17 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    looked = scd2_lookup(facts, h2, ["o_custkey"], "o_orderdate")
    lk_rows = looked.select(
        F.lit("lookup").alias("component"),
        F.col("o_orderkey").alias("k"),
        F.coalesce(F.col("o_orderpriority"), F.lit(_NULL)).alias("v"),
        F.col("o_orderdate").alias("ts_a"),
        F.lit(None).cast("timestamp").alias("ts_b"),
    )
    return hist_rows.unionByName(lk_rows)


# -------------------------------------------------------------- model ops
#: fixed, well-ordered merge list — every part is a base char or an
#: earlier merge's product, the property real learned lists have
_BPE_MERGES = [("t", "h"), ("th", "e")]
#: fixed PQ codebooks: m=2 subspaces x 4 constant-vector centroids over
#: the 64-dim embeddings (32 dims per subspace)
_PQ_CENTROIDS = [[-0.10, 0.00, 0.10, 0.20], [-0.15, -0.05, 0.05, 0.15]]
_PQ_DSUB = 32
_PQ_QUERIES = 3
_PQ_K = 5

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_BPE_TOK = (
    "len(w) + 1 - (len(w) - len(replace(w, 'th', ''))) // 2"
    " - (len(w) - len(replace(w, 'the', ''))) // 3"
)


def _pq_dists(vals: list[float], j: int) -> list[str]:
    sl = f"embedding[{j * _PQ_DSUB + 1}:{(j + 1) * _PQ_DSUB}]"
    return [
        f"list_sum(list_transform({sl},"
        f" e -> (e::DOUBLE - ({v}))*(e::DOUBLE - ({v}))))"
        for v in vals
    ]


def _pq_code(ds: list[str]) -> str:
    # argmin, ties to the lowest code id — mirrors array_position(min)
    return (
        f"CASE WHEN {ds[0]} <= {ds[1]} AND {ds[0]} <= {ds[2]}"
        f" AND {ds[0]} <= {ds[3]} THEN 0"
        f" WHEN {ds[1]} <= {ds[2]} AND {ds[1]} <= {ds[3]} THEN 1"
        f" WHEN {ds[2]} <= {ds[3]} THEN 2 ELSE 3 END"
    )


def _pq_sql() -> str:
    d0 = _pq_dists(_PQ_CENTROIDS[0], 0)
    d1 = _pq_dists(_PQ_CENTROIDS[1], 1)
    luts = ", ".join(
        f"{expr} AS l{j}{c}"
        for j, ds in enumerate((d0, d1))
        for c, expr in enumerate(ds)
    )
    adc0 = "CASE e.c0 " + " ".join(
        f"WHEN {c} THEN q.l0{c}" for c in range(4)
    ) + " END"
    adc1 = "CASE e.c1 " + " ".join(
        f"WHEN {c} THEN q.l1{c}" for c in range(4)
    ) + " END"
    return f"""
  enc AS (SELECT vec_id, {_pq_code(d0)} AS c0, {_pq_code(d1)} AS c1
          FROM embeddings),
  pq_q AS (SELECT vec_id AS query_id, {luts}
           FROM embeddings WHERE vec_id < {_PQ_QUERIES}),
  pq_pairs AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round({adc0} + {adc1}, 6) AS approx_dist
    FROM enc e, pq_q q WHERE e.vec_id <> q.query_id),
  pq_r AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY approx_dist, neighbor_id) AS rank
    FROM pq_pairs)"""


_QUALITY_SQL = f"""
  q_rows AS (
    SELECT * FROM (VALUES
      ('not_null(o_custkey)',
        (SELECT count(*) FROM orders WHERE o_custkey IS NULL)),
      ('in_range(o_totalprice)',
        (SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL
          AND NOT (o_totalprice >= 0 AND o_totalprice <= 150000))),
      ('in_set(o_orderstatus)',
        (SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('F', 'O'))),
      ('matches(o_orderpriority)',
        (SELECT count(*) FROM orders WHERE o_orderpriority IS NOT NULL
          AND NOT regexp_matches(o_orderpriority, '^[1-3]-'))),
      ('predicate(o_totalprice > 1000)',
        (SELECT count(*) FROM orders
         WHERE NOT coalesce(o_totalprice > 1000, TRUE))),
      ('unique(o_custkey)',
        (SELECT coalesce(sum(cnt - 1), 0) FROM
          (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) WHERE cnt > 1)),
      ('ref(o_custkey)',
        (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN
            (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)))
    ) AS t(rule, violations))"""

_MODEL_OPS_SQL = f"""
WITH bpe AS (
  SELECT lang, count(*) AS n_docs,
         coalesce(sum(coalesce(
           list_sum(list_transform({_TOKS}, w -> {_BPE_TOK})), 0)), 0) AS toks
  FROM documents GROUP BY lang),
tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
vstats AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM tok GROUP BY token),
vocab AS (
  SELECT token, tf, df,
         row_number() OVER (ORDER BY tf DESC, token) AS rank
  FROM vstats ORDER BY tf DESC, token LIMIT 50),
{_QUALITY_SQL},
{_pq_sql()}
SELECT 'bpe' AS component, n_docs AS k, lang AS v, toks::DOUBLE AS x FROM bpe
UNION ALL
SELECT 'vocab_tf', rank, token, tf::DOUBLE FROM vocab
UNION ALL
SELECT 'vocab_df', rank, token, df::DOUBLE FROM vocab
UNION ALL
SELECT 'quality', violations::BIGINT, rule, violations::DOUBLE FROM q_rows
UNION ALL
SELECT 'pq', query_id * 1000 + rank, neighbor_id::VARCHAR, approx_dist
FROM pq_r WHERE rank <= {_PQ_K}
"""


@q("model_ops_battery", _MODEL_OPS_SQL)
def model_ops_battery(spark: SparkSession, sf: str) -> DataFrame:
    from hrdp_variant_load_pipeline_spark.functions.bpe import bpe_tokenize
    from hrdp_variant_load_pipeline_spark.operators.pq import pq_encode, pq_topk
    from hrdp_variant_load_pipeline_spark.operators.quality import (
        check_constraints,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import build_vocab

    d = table(spark, sf, "documents")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    e = table(spark, sf, "embeddings")

    bpe = (
        d.select("lang", bpe_tokenize(F.col("text"), _BPE_MERGES).alias("toks"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.size("toks")).cast("double").alias("x"),
        )
        .select(
            F.lit("bpe").alias("component"), "k", F.col("lang").alias("v"), "x"
        )
    )

    # 50 rows, consumed twice (tf + df branches): materialize so the
    # explode + token aggregate + TakeOrdered subtree runs once
    vocab = build_vocab(d, "text", max_vocab=50).localCheckpoint()
    vocab_tf = vocab.select(
        F.lit("vocab_tf").alias("component"),
        F.col("rank").cast("long").alias("k"),
        F.col("token").alias("v"),
        F.col("tf").cast("double").alias("x"),
    )
    vocab_df = vocab.select(
        F.lit("vocab_df").alias("component"),
        F.col("rank").cast("long").alias("k"),
        F.col("token").alias("v"),
        F.col("df").cast("double").alias("x"),
    )

    rules = [
        {"type": "not_null", "col": "o_custkey"},
        {"type": "in_range", "col": "o_totalprice", "min": 0.0, "max": 150000.0},
        {"type": "in_set", "col": "o_orderstatus", "values": ["F", "O"]},
        {"type": "matches", "col": "o_orderpriority", "pattern": "^[1-3]-"},
        {"type": "predicate", "expr": "o_totalprice > 1000"},
        {"type": "unique", "cols": ["o_custkey"]},
        {
            "type": "ref",
            "col": "o_custkey",
            "ref_df": c.filter(F.col("c_custkey") % 3 == 0),
            "ref_col": "c_custkey",
        },
    ]
    quality = check_constraints(o, rules).select(
        F.lit("quality").alias("component"),
        F.col("violations").alias("k"),
        F.col("rule").alias("v"),
        F.col("violations").cast("double").alias("x"),
    )

    cb = spark.createDataFrame(
        [
            (j, c_id, [float(v)] * _PQ_DSUB)
            for j, vals in enumerate(_PQ_CENTROIDS)
            for c_id, v in enumerate(vals)
        ],
        "subspace int, code_id int, cvec array<double>",
    )
    enc = pq_encode(e, cb, id_col="vec_id", vec_col="embedding")
    topk = pq_topk(
        enc,
        e.filter(F.col("vec_id") < _PQ_QUERIES),
        cb,
        k=_PQ_K,
        id_col="vec_id",
        vec_col="embedding",
    )
    pq_rows = topk.select(
        F.lit("pq").alias("component"),
        (F.col("query_id") * 1000 + F.col("rank")).alias("k"),
        F.col("neighbor_id").cast("string").alias("v"),
        F.col("approx_dist").alias("x"),
    )

    return (
        bpe.unionByName(vocab_tf)
        .unionByName(vocab_df)
        .unionByName(quality)
        .unionByName(pq_rows)
    )
