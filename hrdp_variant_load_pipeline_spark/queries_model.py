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

#: fixed unigram-LM piece table for the Viterbi-apply driver gate
#: (functions/unigram.py:unigram_tokenize): every single char plus
#: 'th'/'the', with log-probs chosen so the OPTIMAL segmentation has a
#: closed form the oracle can state independently. Because 'the' beats
#: th+e (-2.5 > -6) and 'th' beats t+h (-2 > -8), and neither 'th' nor
#: 'the' can overlap itself or each other except as prefix ('the'
#: contains exactly one 'th'), the Viterbi optimum takes EVERY 'the'
#: occurrence plus every remaining 'th':
#:   pieces(w) = len(w) - c_the - c_th
#:   score(w)  = -4*len(w) + 3.5*c_the + 6*c_th
#: where c_the / c_th are total occurrence counts (replace-delta
#: countable in SQL). The score pins piece IDENTITIES, not just counts:
#: it is re-derived Spark-side from the emitted pieces via a literal
#: log-prob map, so a wrong-but-same-length segmentation would diverge.
_UNI_CHAR_LP = -4.0
_UNI_PIECES = {
    **{c: _UNI_CHAR_LP for c in "abcdefghijklmnopqrstuvwxyz"},
    "th": -2.0,
    "the": -2.5,
}
_UNI_CTHE = "((len(w) - len(replace(w, 'the', ''))) // 3)"
_UNI_CTH = "((len(w) - len(replace(w, 'th', ''))) // 2)"
_UNI_NP = f"len(w) - {_UNI_CTHE} - {_UNI_CTH}"
_UNI_SC = f"-4.0*len(w) + 3.5*{_UNI_CTHE} + 6.0*{_UNI_CTH}"


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

# k-center greedy coreset (operators/selection.py): unrolled greedy
# steps — each CTE folds the rounded cosine distance to the newest
# center into the standing min, then picks argmax (d desc, id asc),
# mirroring the operator's 6dp-rounded trajectory exactly.
_KC_K = 4


def _kcenter_cte(k: int) -> tuple[str, str]:
    parts = [
        """kcb AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
  WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
kcd0 AS (
  SELECT b.id, b.v, b.nrm,
         CASE WHEN b.id = s.id THEN -1.0
              ELSE round(1.0 - list_dot_product(b.v, s.v) / (b.nrm * s.nrm), 6)
         END AS d
  FROM kcb b, (SELECT id, v, nrm FROM kcb ORDER BY id LIMIT 1) s)"""
    ]
    for i in range(1, k):
        parts.append(
            f"""kcp{i} AS (SELECT id, v, d FROM kcd{i - 1}
         ORDER BY d DESC, id LIMIT 1),
kcd{i} AS (
  SELECT b.id, b.v, b.nrm,
         CASE WHEN b.id = p.id THEN -1.0
              ELSE least(b.d,
                round(1.0 - list_dot_product(b.v, p.v) / (b.nrm * {_norm('p.v')}), 6))
         END AS d
  FROM kcd{i - 1} b, kcp{i} p)"""
        )
    arms = ["SELECT 'kcenter' AS component, 0::BIGINT AS k, "
            "(SELECT id FROM kcb ORDER BY id LIMIT 1)::VARCHAR AS v, "
            "CAST(NULL AS DOUBLE) AS x"]
    arms += [
        f"SELECT 'kcenter', {i}, id::VARCHAR, d FROM kcp{i} WHERE d > 0"
        for i in range(1, k)
    ]
    return ",\n".join(parts), "\nUNION ALL\n".join(arms)


def _norm(v: str) -> str:
    return f"sqrt(list_dot_product({v}, {v}))"


_KC_CTES, _KC_ARMS = _kcenter_cte(_KC_K)

_MODEL_OPS_SQL = f"""
WITH bpe AS (
  SELECT lang, count(*) AS n_docs,
         coalesce(sum(coalesce(
           list_sum(list_transform({_TOKS}, w -> {_BPE_TOK})), 0)), 0) AS toks
  FROM documents GROUP BY lang),
uni AS (
  SELECT lang, count(*) AS n_docs,
         coalesce(sum(coalesce(
           list_sum(list_transform({_TOKS}, w -> {_UNI_NP})), 0)), 0) AS np,
         coalesce(sum(coalesce(
           list_sum(list_transform({_TOKS}, w -> {_UNI_SC})), 0.0)), 0.0) AS sc
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
{_pq_sql()},
{_KC_CTES}
SELECT 'bpe' AS component, n_docs AS k, lang AS v, toks::DOUBLE AS x FROM bpe
UNION ALL
SELECT 'uni_pieces', n_docs, lang, np::DOUBLE FROM uni
UNION ALL
SELECT 'uni_score', n_docs, lang, round(sc::DOUBLE, 6) FROM uni
UNION ALL
SELECT 'vocab_tf', rank, token, tf::DOUBLE FROM vocab
UNION ALL
SELECT 'vocab_df', rank, token, df::DOUBLE FROM vocab
UNION ALL
SELECT 'quality', violations::BIGINT, rule, violations::DOUBLE FROM q_rows
UNION ALL
SELECT 'pq', query_id * 1000 + rank, neighbor_id::VARCHAR, approx_dist
FROM pq_r WHERE rank <= {_PQ_K}
UNION ALL
{_KC_ARMS}
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

    # BPE + unigram arms ride ONE word_weighted_stats pass: both
    # tokenizers are word-bounded, so every per-doc statistic here
    # (token counts, piece counts, summed piece log-probs) decomposes
    # over (lang, word) frequencies — the corpus is touched once by a
    # JVM explode+agg and BOTH Arrow UDFs run over the distinct-word
    # table only (vocabulary-sized Python, ~70x fewer words than the
    # corpus at sf10). Values are EXACT vs the per-doc form: counts are
    # integers and the per-word scores are multiples of 0.5 (closed
    # form -4·len + 3.5·c_the + 6·c_th), so the reassociated double
    # sums cannot drift. The uni score still re-derives each emitted
    # piece's log-prob from a literal map, pinning piece IDENTITIES.
    from hrdp_variant_load_pipeline_spark.functions.unigram import (
        unigram_tokenize,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        word_weighted_stats,
    )

    uni_pieces = spark.createDataFrame(
        sorted(_UNI_PIECES.items()), "piece string, logprob double"
    )
    lp_map = F.create_map(
        *[F.lit(v) for kv in sorted(_UNI_PIECES.items()) for v in kv]
    )

    def _word_stats(words):
        toked = unigram_tokenize(words, "word", uni_pieces)
        return toked.select(
            "word",
            F.size(bpe_tokenize(F.col("word"), _BPE_MERGES)).alias("n_toks"),
            F.size("pieces").alias("np"),
            F.aggregate(
                F.transform(
                    "pieces",
                    lambda p: F.coalesce(
                        F.try_element_at(lp_map, p), F.lit(-100.0)
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sc"),
        )

    # 5 rows, consumed by three component branches: checkpoint so the
    # decomposition pass runs once; eager=False (r16) so it
    # materializes inside the union action alongside the other
    # components instead of as a blocking construction-time job
    tok_agg = word_weighted_stats(
        d, "text", ["lang"], _word_stats
    ).localCheckpoint(eager=False)
    bpe = tok_agg.select(
        F.lit("bpe").alias("component"),
        F.col("n_docs").alias("k"),
        F.col("lang").alias("v"),
        F.col("sum_n_toks").alias("x"),
    )
    uni = tok_agg.select(
        F.lit("uni_pieces").alias("component"),
        F.col("n_docs").alias("k"),
        F.col("lang").alias("v"),
        F.col("sum_np").alias("x"),
    ).unionByName(
        tok_agg.select(
            F.lit("uni_score").alias("component"),
            F.col("n_docs").alias("k"),
            F.col("lang").alias("v"),
            F.round(F.col("sum_sc"), 6).alias("x"),
        )
    )

    # 50 rows, consumed twice (tf + df branches): snapshot so the
    # explode + token aggregate + TakeOrdered subtree runs once;
    # eager=False for the same scheduling reason as tok_agg above
    vocab = build_vocab(d, "text", max_vocab=50).localCheckpoint(eager=False)
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

    # k-center greedy coreset: the trajectory is model-sized driver
    # state (it IS the selected set), so the component re-frames it —
    # the distributed work is the k stateless argmax scans inside the
    # operator (one action per step, no corpus shuffle/cache/join).
    from hrdp_variant_load_pipeline_spark.operators.selection import (
        kcenter_greedy,
    )

    traj = kcenter_greedy(e, "vec_id", "embedding", k=_KC_K)
    kc = spark.createDataFrame(
        [(s, str(i), d) for s, i, d in traj], "step long, id string, d double"
    ).select(
        F.lit("kcenter").alias("component"),
        F.col("step").alias("k"),
        F.col("id").alias("v"),
        F.col("d").alias("x"),
    )

    return (
        bpe.unionByName(uni)
        .unionByName(vocab_tf)
        .unionByName(vocab_df)
        .unionByName(quality)
        .unionByName(pq_rows)
        .unionByName(kc)
    )


# ----------------------------------------------------- corpus stats battery
# Driver-gates the corpus operator families in one window slot:
# corpus-wide paragraph dedup (exact reassembly pinned via md5), n-gram
# count tables, sparse TF-IDF + broadcast sparse cosine, stupid-backoff
# n-gram LM document scoring (the CCNet perplexity-filter chain
# end-to-end, with the Brants-2007 smoothing web-scale filters use),
# Gopher/C4/DSIR gates, and BM25 retrieval scoring — both the one-shot
# operator and the persisted inverted-index probe (r12 continuation).
# The documents texts are single-line word soup, so the "paragraph"
# separator is the word boundary (sep=' ', min_chars=4): every token of
# >= 4 chars is deduped corpus-wide to its first (doc, position)
# occurrence — semantically a token-level variant, structurally the
# exact operator (eligibility gate, min_by canonical pick, in-order
# reassembly, empty-doc coalesce).
_CS_SEP = " "
_CS_MINCH = 4
_CS_SPAN_K = 6
_CS_VOCAB = 50
_CS_NG_MIN = 5
_CS_NG_TOP = 20
_CS_LM_MIN = 2
_CS_TFIDF_Q = 3
_CS_TFIDF_MIN = 0.5
# gopher-rule thresholds, tuned to the synthetic word-soup so each
# word-denominated rule actually splits the corpus (words 20-80 passes
# 358/500, stopwords >= 2 passes 224/500, avg-len [4.0, 4.75] brackets
# the distribution's center) — the line-shape and symbol rules pass
# vacuously on single-line symbol-free soup but stay in the battery so
# the cross-engine mirror pins their expressions too
_CS_GOPH_MINW = 20
_CS_GOPH_MAXW = 80
_CS_GOPH_MINAVG = 4.0
_CS_GOPH_MAXAVG = 4.75
_CS_GOPH_SYMR = 0.05
_CS_GOPH_BULLET = 0.9
_CS_GOPH_ELLIPSIS = 0.3
_CS_GOPH_ALPHA = 0.8
_CS_GOPH_STOPS = 2
# DSIR: 64 hashed uni+bigram buckets, target = the 'en' slice of the
# pool, Gumbel top-25 resample
_CS_DSIR_B = 64
_CS_DSIR_K = 25
_CS_DSIR_SALT = "dsir"
_CS_DSIR_PICK_SALT = "dsirpick"
# BM25 (Robertson & Zaragoza 2009; Lucene's non-negative idf) against a
# fixed 4-term query over the word-soup — the retrieval-scoring surface
# (decontamination-by-search / data selection). k1/b at the universal
# defaults; floating-point association mirrored term-by-term between the
# Spark operator and the oracle so round(.,6) hashes agree.
_CS_BM25_TERMS = ("join", "window", "spark", "stream")
_CS_BM25_K1 = 1.2
_CS_BM25_B = 0.75


def _bm25_cte(terms: tuple[str, ...], k1: float, b: float) -> str:
    """DuckDB CTE block for the bm25 component: per-term tf via row-local
    list_filter (mirror of the operator's higher-order filter), ONE
    scalar-stats CTE, left-associated score sum in term order."""
    tfs = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ",\n               ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(terms))
    )
    terms_sum = "\n           + ".join(
        f"ln(1 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * {k1 + 1.0!r}"
        f" / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""bmw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents),
bmt AS (
  SELECT doc_id, len(w)::DOUBLE AS dl,
         {tfs}
  FROM bmw),
bms AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
               {dfs}
        FROM bmt),
bm25 AS (
  SELECT doc_id,
         round(0.0 + {terms_sum}, 6) AS score
  FROM bmt, bms)"""

# --- rdprobe component (folded-in r15; was the standalone
# retrieval_decon_probe row, registry position 52 — outside the driver's
# 50-row correctness window, so it had never faced the oracle). The
# retrieval-driven decontamination stage's core probe
# (text_index_topk_many with BOTH scale bounds: max_df_frac pruning +
# rarest-N max_query_terms). The driver corpora's 31-type base
# vocabulary makes every content word df~N (everything would prune), so
# both engines first apply the IDENTICAL deterministic transform: each
# doc gains one ' marker<doc_id % 97>' token, giving 97 rare terms with
# df ~ N/97 at every SF. The three literal queries exercise the three
# probe paths: q0 mixes rare terms with a common term (df-pruned at the
# base corpora, dynamically re-admitted wherever df <= frac*N — both
# engines compute the cut, nothing is hardcoded) and an OOV term; q1 is
# the r14 OOV-crowding regression shape (budget 2, two OOV tokens + one
# real rare term — the real term must survive the cut); q2 is plain
# rare-term retrieval. Scores are rounded BEFORE ranking on both sides
# (round_digits — libm ln can differ by 1 ulp across engines, and the
# top-k cut must not hinge on it).
_RDP_K1, _RDP_B, _RDP_K = 1.2, 0.75, 10
_RDP_FRAC, _RDP_TERMS = 0.5, 2
_RDP_QUERIES = (
    (0, ("marker13", "marker31", "spark", "zzqqoov")),
    (1, ("marker5", "zzqqoova", "zzqqoovb")),
    (2, ("marker95", "marker96")),
)


def _rdp_cte() -> str:
    """DuckDB CTE block for the rdprobe component (rp-prefixed names —
    it shares the battery's WITH clause)."""
    values = ", ".join(
        f"({qid}, '{t}', {pos})"
        for qid, terms in _RDP_QUERIES
        for pos, t in enumerate(terms)
    )
    return rf"""rpd2 AS (SELECT doc_id,
                   text || ' marker' || (doc_id % 97)::VARCHAR AS text
            FROM documents),
rpw AS (SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
      FROM rpd2),
rpst AS (SELECT count(*)::DOUBLE AS n, avg(len(w))::DOUBLE AS avgdl FROM rpw),
rpq(query_id, term, qpos) AS (VALUES {values}),
rptf AS (SELECT rpw.doc_id, rpq.query_id, rpq.term, rpq.qpos,
                len(rpw.w)::DOUBLE AS dl,
                len(list_filter(rpw.w, x -> x = rpq.term))::DOUBLE AS tf
         FROM rpw CROSS JOIN rpq),
rpdf AS (SELECT term,
                count(DISTINCT CASE WHEN tf > 0 THEN doc_id END)::DOUBLE AS df
         FROM rptf GROUP BY term),
rpsurv AS (SELECT q2.query_id, q2.term, q2.qpos, d.df,
                  row_number() OVER (PARTITION BY q2.query_id
                                     ORDER BY d.df, q2.term) AS rk
           FROM (SELECT DISTINCT query_id, term, qpos FROM rpq) q2
           JOIN rpdf d USING (term), rpst
           WHERE d.df > 0 AND d.df <= {_RDP_FRAC} * rpst.n),
rpcontrib AS (SELECT t.query_id, t.doc_id,
                     ln(1 + (rpst.n - s.df + 0.5) / (s.df + 0.5)) * t.tf
                     * {_RDP_K1 + 1.0!r}
                     / (t.tf + {_RDP_K1!r} * ({1.0 - _RDP_B!r}
                        + {_RDP_B!r} * t.dl / rpst.avgdl)) AS c
              FROM rptf t
              JOIN rpsurv s ON t.query_id = s.query_id AND t.term = s.term,
                   rpst
              WHERE s.rk <= {_RDP_TERMS} AND t.tf > 0),
rpsc AS (SELECT query_id, doc_id, round(sum(c), 6) AS score
         FROM rpcontrib GROUP BY 1, 2),
rpr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
        FROM rpsc)"""


# --- semdecon component (new r15; r14 verdict directive #2): the
# semantic-decontamination bounded probe — sparse_cosine_candidates at
# the production knob SHAPE (max_df_frac=0.05, max_probe_terms=8) —
# under the driver oracle. Exercises ALL THREE probe paths in one row:
# rarest-first probe-rank selection (each bench item's marker term is
# the only rank under the df cutoff), the inverted candidate pass +
# exact-cosine-for-candidates-only, AND the r15 empty-probe exhaustive
# fallback (one literal bench item built entirely from corpus-common
# terms — every rank prunes, so it must be scored against the whole
# corpus, not silently skipped). The bench side is a deterministic
# corpus transform both engines apply identically: every 53rd doc keeps
# its odd-position words (a "rewrite" that drifts tf but keeps the
# term profile) plus its rpd2 marker token, mapped to the negative id
# space exactly like plans/corpus_pipeline.semantic_decontaminate.
_SD_VOCAB = 200
_SD_FRAC = 0.05
_SD_MPT = 8
# 0.5 keeps the fallback item's top matches IN the output (its max
# cosine vs the word-soup corpus measures 0.574 at sf0.01 / sf0.1): a
# broken fallback must change the driver hash, not just an internal path
_SD_MIN = 0.5
_SD_BENCH_MOD = 53
_SD_BENCH_REM = 3
# bench-side id cap: a decontamination bench is a FIXED evaluation set
# (query-sized by the operator's contract), not a corpus fraction. An
# uncapped every-53rd-doc selection scales the bench WITH the corpus and
# the candidate pair space quadratically with it — measured 503 s at
# sf10 (9.4k bench items × ~N/97 marker-sharing candidates ≈ 50M exact
# cosines) vs ~120 s for the whole battery before the fold-in. The cap
# is a no-op at sf0.1 and below (N ≤ 50k), so the sf0.01/sf0.1 oracle
# validation is unchanged; at sf10 it pins the bench at 943 items.
_SD_BENCH_CAP = 50_000
# below every mapped bench id (-(doc_id)-1 ∈ [-N-1, -1]) for any fixture
# this battery faces (N ≤ 500k at the sf10 staging)
_SD_FALLBACK_ID = -1000003
_SD_FALLBACK_TEXT = "join window spark stream"


def _sd_cte() -> str:
    """DuckDB CTE block for the semdecon component (sd-prefixed; reuses
    rpd2/rpw/rpst from the rdprobe block — same marker transform, same
    corpus). Mirrors build_vocab (rank = row_number by tf desc, token),
    tfidf_vectors (smoothed idf, L2-normalized, per-entry round 6) and
    sparse_cosine_candidates (df-ranked probe selection, candidate
    pass, exact cosine, empty-probe fallback) term by term."""
    return rf"""sdtok AS (SELECT doc_id, unnest(w) AS token FROM rpw),
sdvocab AS (
  SELECT token, df, row_number() OVER (ORDER BY tf DESC, token) AS rank
  FROM (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM sdtok GROUP BY token)
  ORDER BY tf DESC, token LIMIT {_SD_VOCAB}),
sdtw AS (SELECT t.doc_id, t.token,
                count(*) * (ln((rpst.n + 1) / (v.df + 1)) + 1) AS w
         FROM sdtok t JOIN sdvocab v USING (token), rpst
         GROUP BY t.doc_id, t.token, v.df, rpst.n),
sdnrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM sdtw GROUP BY doc_id),
sduv AS (SELECT sdtw.doc_id, token, round(w / nn, 6) AS uw
         FROM sdtw JOIN sdnrm USING (doc_id)),
-- bench side: odd-position words + the marker, negative-mapped ids,
-- plus ONE all-common-terms literal row (the empty-probe fallback path)
sdbench AS (
  SELECT -(doc_id) - 1 AS bid,
         array_to_string(list_filter(
           list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
           (x, i) -> i % 2 = 1), ' ')
         || ' marker' || (doc_id % 97)::VARCHAR AS text
  FROM documents
  WHERE doc_id % {_SD_BENCH_MOD} = {_SD_BENCH_REM}
    AND doc_id < {_SD_BENCH_CAP}
  UNION ALL
  SELECT {_SD_FALLBACK_ID}, '{_SD_FALLBACK_TEXT}'),
sdbtok AS (
  SELECT bid, unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '')) AS token
  FROM sdbench),
sdbtw AS (SELECT t.bid, t.token,
                 count(*) * (ln((rpst.n + 1) / (v.df + 1)) + 1) AS w
          FROM sdbtok t JOIN sdvocab v USING (token), rpst
          GROUP BY t.bid, t.token, v.df, rpst.n),
sdbnrm AS (SELECT bid, sqrt(sum(w * w)) AS nn FROM sdbtw GROUP BY bid),
sdbuv AS (SELECT sdbtw.bid, token, round(w / nn, 6) AS uw
          FROM sdbtw JOIN sdbnrm USING (bid)),
-- corpus df per vocab token, from the VECTORS (one row per doc, token)
sdrdf AS (SELECT token, count(*)::DOUBLE AS df FROM sdtw GROUP BY token),
sdprobe AS (
  SELECT bid, token FROM (
    SELECT b.bid, b.token,
           row_number() OVER (PARTITION BY b.bid
                              ORDER BY rd.df ASC, b.uw DESC, v.rank ASC)
             AS k
    FROM sdbuv b JOIN sdrdf rd USING (token) JOIN sdvocab v USING (token),
         rpst
    WHERE rd.df <= greatest(1.0, {_SD_FRAC} * rpst.n))
  WHERE k <= {_SD_MPT}),
sdcand AS (
  SELECT DISTINCT a.doc_id AS id_a, p.bid AS id_b
  FROM sdtw a JOIN sdprobe p USING (token)),
sdfall AS (
  SELECT d.doc_id AS id_a, u.bid AS id_b
  FROM rpd2 d CROSS JOIN (
    SELECT bid FROM sdbench
    EXCEPT SELECT DISTINCT bid FROM sdprobe) u),
sddot AS (
  SELECT c.id_a, c.id_b, round(sum(a.uw * b.uw), 6) AS cosine
  FROM (SELECT id_a, id_b FROM sdcand
        UNION ALL SELECT id_a, id_b FROM sdfall) c
  JOIN sduv a ON a.doc_id = c.id_a
  JOIN sdbuv b ON b.bid = c.id_b AND b.token = a.token
  GROUP BY c.id_a, c.id_b)"""


_CORPUS_STATS_SQL = rf"""
WITH paras AS (
  SELECT doc_id, unnest(string_split(text, '{_CS_SEP}')) AS para,
         generate_subscripts(string_split(text, '{_CS_SEP}'), 1) - 1 AS idx
  FROM documents),
elig AS (SELECT *, length(para) >= {_CS_MINCH} AS eligible FROM paras),
canon AS (
  SELECT doc_id, idx, TRUE AS keeper FROM (
    SELECT doc_id, idx,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
    FROM elig WHERE eligible) WHERE rn = 1),
kept AS (
  SELECT e.doc_id, e.idx, e.para
  FROM elig e LEFT JOIN canon c USING (doc_id, idx)
  WHERE NOT e.eligible OR c.keeper IS NOT NULL),
rebuilt AS (
  SELECT doc_id, string_agg(para, '{_CS_SEP}' ORDER BY idx) AS new_text
  FROM kept GROUP BY doc_id),
parad AS (
  SELECT d.doc_id AS k, md5(coalesce(r.new_text, '')) AS s,
         length(coalesce(r.new_text, ''))::BIGINT AS n
  FROM documents d LEFT JOIN rebuilt r USING (doc_id)),

pw AS (
  SELECT doc_id,
         list_concat(list_concat(['<s>'],
           list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')),
           ['</s>']) AS pwv
  FROM documents),
ptok AS (SELECT doc_id, unnest(pwv) AS word,
                generate_subscripts(pwv, 1) AS i FROM pw),
grams AS (SELECT a.doc_id, a.word AS w1, b.word AS w2
          FROM ptok a JOIN ptok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
ngc AS (SELECT w1, w2, count(*) AS c FROM grams GROUP BY w1, w2),
ngtop AS (SELECT w1 || ' ' || w2 AS s, c AS n FROM ngc
          WHERE c >= {_CS_NG_MIN} ORDER BY c DESC, s LIMIT {_CS_NG_TOP}),

tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS token
  FROM documents),
stats AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
          FROM tok GROUP BY token),
vocab AS (SELECT token, df FROM stats ORDER BY tf DESC, token LIMIT {_CS_VOCAB}),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
tw AS (SELECT t.doc_id, t.token,
              count(*) * (ln((nd.n + 1) / (v.df + 1)) + 1) AS w
       FROM tok t JOIN vocab v USING (token), nd
       GROUP BY t.doc_id, t.token, v.df, nd.n),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM tw GROUP BY doc_id),
uv AS (SELECT tw.doc_id, token, round(w / nn, 6) AS uw
       FROM tw JOIN nrm USING (doc_id)),
cospairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(sum(a.uw * b.uw), 6) AS cosine
  FROM uv a JOIN uv b USING (token)
  WHERE b.doc_id < {_CS_TFIDF_Q} AND a.doc_id <> b.doc_id
  GROUP BY 1, 2),

sw AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word,
         generate_subscripts(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''), 1) AS idx,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n
  FROM documents),
swv AS (
  SELECT doc_id, idx,
         md5(string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY idx
             ROWS BETWEEN CURRENT ROW AND {_CS_SPAN_K - 1} FOLLOWING)) AS h,
         n
  FROM sw QUALIFY idx <= n - {_CS_SPAN_K} + 1),
sanch AS (SELECT h FROM swv GROUP BY h HAVING count(*) >= 2),
scanon AS (SELECT doc_id, idx, h,
                  row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
           FROM swv),
sdup AS (SELECT c.doc_id, c.idx FROM scanon c JOIN sanch USING (h) WHERE rn > 1),
scov AS (SELECT DISTINCT d.doc_id, d.idx + g.i AS idx
         FROM sdup d, generate_series(0, {_CS_SPAN_K - 1}) g(i)),
skept AS (SELECT s.doc_id, s.idx, s.word
          FROM sw s LEFT JOIN scov c ON s.doc_id = c.doc_id AND s.idx = c.idx
          WHERE c.doc_id IS NULL),
srebuilt AS (SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS new_text
             FROM skept GROUP BY doc_id),
spand AS (
  SELECT d.doc_id AS k, md5(coalesce(r.new_text, '')) AS s,
         length(coalesce(r.new_text, ''))::BIGINT AS n
  FROM documents d LEFT JOIN srebuilt r USING (doc_id)),

lmcnt AS (SELECT w1, w2, c FROM ngc WHERE c >= {_CS_LM_MIN}),
lmctx AS (SELECT w1, sum(c) AS cc FROM lmcnt GROUP BY w1),
lmuni AS (SELECT w2, sum(c) AS wc FROM lmcnt GROUP BY w2),
lmv AS (SELECT (count(DISTINCT w2) + 1)::DOUBLE AS v,
               coalesce(sum(c), 0)::DOUBLE AS nn FROM lmcnt),
-- stupid backoff (alpha = 0.4): seen grams score raw relative
-- frequency; unseen ones back off to the continuation word's add-1
-- smoothed unigram frequency
lmsc AS (
  SELECT g.doc_id,
         round(avg(ln(CASE WHEN cnt.c IS NOT NULL
                           THEN cnt.c / ctx.cc::DOUBLE
                           ELSE 0.4 * (coalesce(uni.wc, 0) + 1.0)
                                / (lmv.nn + lmv.v) END)), 6) AS lp
  FROM grams g
  LEFT JOIN lmcnt cnt ON g.w1 = cnt.w1 AND g.w2 = cnt.w2
  LEFT JOIN lmctx ctx ON g.w1 = ctx.w1
  LEFT JOIN lmuni uni ON g.w2 = uni.w2, lmv
  GROUP BY g.doc_id),

gw AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
  FROM documents),
gstat AS (
  SELECT doc_id, len(w) AS n,
         length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
           / greatest(len(w), 1) AS avglen,
         len(regexp_extract_all(text, '#|\.\.\.|…'))::DOUBLE
           / greatest(len(w), 1) AS symr,
         len(list_filter(string_split_regex(text, '\r\n|\r|\n'),
             l -> regexp_matches(l, '^\s*[-*•‣▪]')))::DOUBLE
           / len(string_split_regex(text, '\r\n|\r|\n')) AS bulletf,
         len(list_filter(string_split_regex(text, '\r\n|\r|\n'),
             l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::DOUBLE
           / len(string_split_regex(text, '\r\n|\r|\n')) AS ellipsisf,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
           / greatest(len(w), 1) AS alphaf,
         len(list_filter(w, x -> x IN ('the','be','to','of','and','that','have','with'))) AS stops
  FROM gw),
gbits AS (
  SELECT doc_id,
     (CASE WHEN NOT (n BETWEEN {_CS_GOPH_MINW} AND {_CS_GOPH_MAXW}) THEN 1 ELSE 0 END)
   + (CASE WHEN NOT (n > 0 AND avglen >= {_CS_GOPH_MINAVG} AND avglen <= {_CS_GOPH_MAXAVG}) THEN 2 ELSE 0 END)
   + (CASE WHEN NOT (n > 0 AND symr <= {_CS_GOPH_SYMR}) THEN 4 ELSE 0 END)
   + (CASE WHEN NOT (bulletf <= {_CS_GOPH_BULLET}) THEN 8 ELSE 0 END)
   + (CASE WHEN NOT (ellipsisf <= {_CS_GOPH_ELLIPSIS}) THEN 16 ELSE 0 END)
   + (CASE WHEN NOT (n > 0 AND alphaf >= {_CS_GOPH_ALPHA}) THEN 32 ELSE 0 END)
   + (CASE WHEN NOT (stops >= {_CS_GOPH_STOPS}) THEN 64 ELSE 0 END) AS bits
  FROM gstat),

dtok AS (SELECT doc_id, lang, unnest(w) AS t, generate_subscripts(w, 1) AS i FROM gw),
dwh AS (
  SELECT doc_id, lang, i,
         ('0x' || substr(md5('{_CS_DSIR_SALT}' || t), 1, 15))::BIGINT AS h
  FROM dtok),
dbuck AS (
  SELECT doc_id, lang, h % {_CS_DSIR_B} AS b FROM dwh
  UNION ALL
  SELECT a.doc_id, a.lang, ((a.h + 3 * b2.h) % 999999999989) % {_CS_DSIR_B} AS b
  FROM dwh a JOIN dwh b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1),
dtcnt AS (SELECT b, count(*) AS c FROM dbuck WHERE lang = 'en' GROUP BY b),
drcnt AS (SELECT b, count(*) AS c FROM dbuck GROUP BY b),
dttot AS (SELECT coalesce(sum(c), 0)::DOUBLE AS t FROM dtcnt),
drtot AS (SELECT coalesce(sum(c), 0)::DOUBLE AS t FROM drcnt),
ddom AS (SELECT unnest(range(0, {_CS_DSIR_B})) AS b),
dlr AS (
  SELECT ddom.b,
         ln((coalesce(tc.c, 0) + 1) / (dttot.t + {_CS_DSIR_B}))
       - ln((coalesce(rc.c, 0) + 1) / (drtot.t + {_CS_DSIR_B})) AS logratio
  FROM ddom LEFT JOIN dtcnt tc USING (b) LEFT JOIN drcnt rc USING (b),
       dttot, drtot),
dscore AS (
  SELECT d.doc_id, coalesce(sum(lr.logratio), 0.0) AS logw
  FROM documents d
  LEFT JOIN dbuck db ON d.doc_id = db.doc_id
  LEFT JOIN dlr lr ON db.b = lr.b
  GROUP BY d.doc_id),
dpick AS (
  SELECT doc_id,
         logw + -ln(-ln(
           (('0x' || substr(md5('{_CS_DSIR_PICK_SALT}' || doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
           / 4294967296.0)) AS key
  FROM dscore
  ORDER BY key DESC, doc_id LIMIT {_CS_DSIR_K}),

ccq AS (SELECT quantile_cont(lp, {1 / 3!r}) AS t1,
               quantile_cont(lp, {2 / 3!r}) AS t2 FROM lmsc),
ccb AS (
  SELECT doc_id,
         CASE WHEN lp < t1 THEN 'tail'
              WHEN lp < t2 THEN 'middle'
              ELSE 'head' END AS bucket
  FROM lmsc, ccq),

-- C4 line + page rules (Raffel et al. 2020 §2.2): keep lines ending in
-- terminal punctuation with >=3 words and no drop phrase; page passes
-- when brace-free, lorem-free, and the cleaned text keeps >=5 sentences.
-- The fixture is single-line, so both engines first reshape it the same
-- deterministic way (sentence breaks at ' line '/' row ', a terminal
-- period, per-doc-id trap lines) — see the Spark side.
c4s AS (
  SELECT doc_id,
         regexp_replace(text, ' (line|row) ', '.' || chr(10), 'g') || '.'
         || CASE WHEN doc_id % 7 = 0
                 THEN chr(10) || 'Please enable Javascript to continue viewing.'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN chr(10) || 'if (x) {{ return; }}' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN chr(10) || 'Lorem Ipsum dolor sit amet filler text.'
                 ELSE '' END AS t
  FROM documents),
c4l AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '\r\n|\r|\n'),
           l -> regexp_matches(l, '[.!?"'']\s*$')
                AND len(list_filter(regexp_split_to_array(l, '\s+'),
                                    x -> x <> '')) >= 3
                AND NOT contains(lower(l), 'javascript')
                AND NOT contains(lower(l), 'terms of use')
                AND NOT contains(lower(l), 'privacy policy')
                AND NOT contains(lower(l), 'cookie policy')
                AND NOT contains(lower(l), 'uses cookies')) AS kept
  FROM c4s),
c4 AS (
  SELECT doc_id,
         md5(coalesce(array_to_string(kept, chr(10)), '')) AS s,
         len(kept)::BIGINT AS n,
         CASE WHEN NOT contains(t, '{{')
                   AND NOT contains(lower(t), 'lorem ipsum')
                   AND len(regexp_extract_all(
                         coalesce(array_to_string(kept, chr(10)), '') || ' ',
                         '[.!?]["'']?\s')) >= 5
              THEN 1.0 ELSE 0.0 END AS x
  FROM c4l),

{_bm25_cte(_CS_BM25_TERMS, _CS_BM25_K1, _CS_BM25_B)},

{_rdp_cte()},

{_sd_cte()}

SELECT 'paradedup' AS component, k, s, n, CAST(NULL AS DOUBLE) AS x FROM parad
UNION ALL
SELECT 'spandedup', k, s, n, NULL FROM spand
UNION ALL
SELECT 'ngram', NULL, s, n, NULL FROM ngtop
UNION ALL
SELECT 'tfidf', id_a, NULL, id_b, cosine FROM cospairs
WHERE cosine >= {_CS_TFIDF_MIN}
UNION ALL
SELECT 'lmscore', doc_id, NULL, NULL, lp FROM lmsc
UNION ALL
SELECT 'gopher', doc_id, NULL, bits::BIGINT, NULL FROM gbits
UNION ALL
SELECT 'dsir', doc_id, NULL, NULL, round(logw, 6) FROM dscore
UNION ALL
SELECT 'dsirpick', doc_id, NULL, NULL, round(key, 6) FROM dpick
UNION ALL
SELECT 'ccnet', doc_id, bucket, NULL, NULL FROM ccb
UNION ALL
SELECT 'c4', doc_id, s, n, x FROM c4
UNION ALL
SELECT 'bm25', doc_id, NULL, NULL, score FROM bm25 WHERE score > 0
UNION ALL
SELECT 'bm25_idx', doc_id, NULL, NULL, score FROM bm25 WHERE score > 0
UNION ALL
SELECT 'rdprobe', doc_id, 'q' || query_id::VARCHAR, rank, score
FROM rpr WHERE rank <= {_RDP_K}
UNION ALL
SELECT 'semdecon', id_a, NULL, id_b, cosine
FROM sddot WHERE cosine >= {_SD_MIN} AND id_a <> id_b
"""


@q("corpus_stats_battery", _CORPUS_STATS_SQL)
def corpus_stats_battery(spark: SparkSession, sf: str) -> DataFrame:
    from hrdp_variant_load_pipeline_spark.functions.text import (
        c4_clean,
        c4_kept_lines,
        c4_page_rules,
        gopher_rules,
    )
    from hrdp_variant_load_pipeline_spark.operators.dedup import (
        paragraph_dedup,
        repeated_span_dedup,
    )
    from hrdp_variant_load_pipeline_spark.operators.dsir import (
        bucket_logratio,
        dsir_log_weight,
        dsir_resample,
        featurize,
    )
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        bm25_scores,
        build_vocab,
        lm_doc_score,
        ngram_counts,
        perplexity_buckets,
        sparse_cosine_pairs,
        tfidf_vectors,
    )
    from hrdp_variant_load_pipeline_spark.sources.tables import spread_for_cpu

    docs = spread_for_cpu(
        table(spark, sf, "documents").select("doc_id", "text")
    )

    deduped = paragraph_dedup(
        docs, "doc_id", "text", sep=_CS_SEP, min_chars=_CS_MINCH
    )
    parad = deduped.select(
        F.lit("paradedup").alias("component"),
        F.col("doc_id").alias("k"),
        F.md5("text").alias("s"),
        F.length("text").cast("long").alias("n"),
        F.lit(None).cast("double").alias("x"),
    )

    spanded = repeated_span_dedup(docs, "doc_id", "text", k=_CS_SPAN_K)
    spand = spanded.select(
        F.lit("spandedup").alias("component"),
        F.col("doc_id").alias("k"),
        F.md5("text").alias("s"),
        F.length("text").cast("long").alias("n"),
        F.lit(None).cast("double").alias("x"),
    )

    # ONE bigram explode+aggregate feeds both the LM counts and (via a
    # filter — _CS_NG_MIN >= _CS_LM_MIN) the top-rows component; two
    # ngram_counts calls would pay the corpus-wide Generate+HashAggregate
    # twice in the same action. Lazily checkpointed so the ngtop branch
    # of the main action reads the same snapshot lm_doc_score's internal
    # pin materializes, instead of re-running the corpus ngram pass.
    counts = ngram_counts(docs, "text", n=2, min_count=_CS_LM_MIN).localCheckpoint(
        eager=False
    )
    ng = counts.filter(F.col("count") >= _CS_NG_MIN)
    ngtop = (
        ng.select(F.array_join("gram", " ").alias("s"), F.col("count").alias("n"))
        .orderBy(F.desc("n"), F.asc("s"))
        .limit(_CS_NG_TOP)
        .select(
            F.lit("ngram").alias("component"),
            F.lit(None).cast("long").alias("k"),
            "s",
            "n",
            F.lit(None).cast("double").alias("x"),
        )
    )

    vocab = build_vocab(docs, "text", max_vocab=_CS_VOCAB)
    # ONE metadata count serves every arm that needs |corpus| (tfidf's
    # idf N here, semdecon's two vector builds and its probe-df cutoff
    # below): a bare parquet count() is row-group metadata only, where
    # the r15 form paid tfidf_vectors' internal docs.count() (a full
    # construction-time job over the repartitioned scan) PLUS a second
    # d2.count() for semdecon. Identical value — spread_for_cpu and the
    # d2 marker projection are row-preserving.
    n_corpus = table(spark, sf, "documents").count()
    # eager=False (r16, the r15 semdecon lesson applied to this arm):
    # the snapshot materializes inside the battery's union action where
    # the scheduler overlaps it with the sibling components, instead of
    # as a blocking construction-time job
    vecs = tfidf_vectors(
        docs, "doc_id", "text", vocab, n_docs=n_corpus
    ).localCheckpoint(eager=False)
    cos = sparse_cosine_pairs(
        vecs,
        vecs.filter(F.col("doc_id") < _CS_TFIDF_Q),
        "doc_id",
        min_cosine=_CS_TFIDF_MIN,
    ).select(
        F.lit("tfidf").alias("component"),
        F.col("id_a").alias("k"),
        F.lit(None).cast("string").alias("s"),
        F.col("id_b").alias("n"),
        F.col("cosine").alias("x"),
    )

    # eager=False (r16): consumed by lm + ccnet + the percentile
    # aggregate's broadcast; the internal id-sized pin inside
    # lm_doc_score dedups the expensive scoring plan, and this battery-
    # level snapshot now materializes lazily instead of serializing a
    # full LM pass before the union action is even built
    lm_scored = lm_doc_score(
        docs, "doc_id", "text", counts, smoothing="stupid_backoff"
    ).select("doc_id", "lm_logprob").localCheckpoint(eager=False)
    lm = lm_scored.select(
        F.lit("lmscore").alias("component"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("long").alias("n"),
        F.col("lm_logprob").alias("x"),
    )
    # CCNet head/middle/tail perplexity tiers over the same LM scores
    # (checkpointed above so the scoring plan runs once, not thrice)
    ccnet = perplexity_buckets(lm_scored, "lm_logprob").select(
        F.lit("ccnet").alias("component"),
        F.col("doc_id").alias("k"),
        F.col("ppl_bucket").alias("s"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("x"),
    )

    # gopher quality rules: per-doc bitmask of FAILED rules (bit order =
    # struct field order), row-local over the same scan
    gr = gopher_rules(
        F.col("text"),
        min_words=_CS_GOPH_MINW,
        max_words=_CS_GOPH_MAXW,
        min_avg_word_len=_CS_GOPH_MINAVG,
        max_avg_word_len=_CS_GOPH_MAXAVG,
        max_symbol_word_ratio=_CS_GOPH_SYMR,
        max_bullet_line_frac=_CS_GOPH_BULLET,
        max_ellipsis_line_frac=_CS_GOPH_ELLIPSIS,
        min_alpha_word_frac=_CS_GOPH_ALPHA,
        min_stopword_hits=_CS_GOPH_STOPS,
    )
    bit_fields = (
        ("words_ok", 1), ("avg_len_ok", 2), ("symbol_ok", 4),
        ("bullet_ok", 8), ("ellipsis_ok", 16), ("alpha_ok", 32),
        ("stopword_ok", 64),
    )
    bits = None
    for field, bit in bit_fields:
        term = F.when(~gr[field], F.lit(bit)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    goph = docs.select(
        F.lit("gopher").alias("component"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("string").alias("s"),
        bits.cast("long").alias("n"),
        F.lit(None).cast("double").alias("x"),
    )

    # C4 line + page rules (Raffel et al. 2020 §2.2), row-local over the
    # same scan. The driver fixture is single-line prose with no terminal
    # punctuation — vacuous for line rules — so the component first
    # RESHAPES it deterministically (both engines apply the identical
    # transform): sentence breaks at ' line '/' row ' word boundaries, a
    # terminal period, and per-doc-id injected trap lines (a Javascript
    # boilerplate line, a brace, a lorem-ipsum placeholder) so every rule
    # fires on real rows. Output: md5 of the line-cleaned text, the
    # surviving-line count, and the page verdict.
    c4_src = F.concat(
        F.regexp_replace(F.col("text"), " (line|row) ", ".\n"),
        F.lit("."),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("\nPlease enable Javascript to continue viewing."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0, F.lit("\nif (x) { return; }")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nLorem Ipsum dolor sit amet filler text."),
        ).otherwise(F.lit("")),
    )
    c4_staged = docs.select(
        "doc_id", c4_src.alias("__t"), c4_clean(c4_src).alias("__c4")
    )
    c4 = c4_staged.select(
        F.lit("c4").alias("component"),
        F.col("doc_id").alias("k"),
        F.md5("__c4").alias("s"),
        F.size(c4_kept_lines(F.col("__t"))).cast("long").alias("n"),
        F.when(
            c4_page_rules(F.col("__t"), F.col("__c4"))["passes"], 1.0
        ).otherwise(0.0).alias("x"),
    )

    # BM25 against the fixed query-term bag: row-local tf over one bound
    # token array + ONE broadcast scalar-stats row — the corpus never
    # shuffles (operator contract, test_bm25_plan_is_shuffle_free...).
    # Filter on the ROUNDED score so both engines apply the identical
    # score>0 predicate.
    bm = (
        bm25_scores(
            docs, "doc_id", "text", list(_CS_BM25_TERMS),
            k1=_CS_BM25_K1, b=_CS_BM25_B,
        )
        .select("doc_id", F.round("bm25", 6).alias("__x"))
        .filter(F.col("__x") > 0)
        .select(
            F.lit("bm25").alias("component"),
            F.col("doc_id").alias("k"),
            F.lit(None).cast("string").alias("s"),
            F.lit(None).cast("long").alias("n"),
            F.col("__x").alias("x"),
        )
    )

    # The same scores via the PERSISTED inverted index (operators/
    # text_index.py): the driver faces the store path — bucket/term
    # pushdown over the clustered postings + the side stats store —
    # against the same closed-form oracle rows. The index is built once
    # per documents fixture (atomic-rename cache keyed on source-file
    # stats) so repeated bench runs time the PROBE, not the build; probe
    # scores are bit-equal to bm25_scores (tests/test_text_index.py), so
    # both arms share the oracle CTE.
    import hashlib
    import os

    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        append_text_index_batch,
        text_index_scores,
    )
    from hrdp_variant_load_pipeline_spark.queries_ml import _cached_tmp_dir

    import hrdp_variant_load_pipeline_spark.operators.text_index as _tix

    src = os.path.join(sf, "documents.parquet")
    st_ = os.stat(src)
    # the key encodes the index CODE too — text_index.py, vocab.py
    # (bm25_tokens, the shared tokenization, lives there) AND
    # sources/store.py (the versioned-store on-disk format the cached
    # fixture depends on): any format or tokenization change invalidates
    # the cache automatically — a hand-bumped tag here would silently
    # serve a stale index
    import hrdp_variant_load_pipeline_spark.operators.vocab as _voc
    import hrdp_variant_load_pipeline_spark.sources.store as _sto

    code_fp = hashlib.md5(
        open(_tix.__file__, "rb").read()
        + open(_voc.__file__, "rb").read()
        + open(_sto.__file__, "rb").read()
    ).hexdigest()[:8]
    ikey = hashlib.md5(
        f"{os.path.realpath(src)}:{st_.st_size}:{st_.st_mtime_ns}:{code_fp}"
        .encode()
    ).hexdigest()[:16]
    store = _cached_tmp_dir(
        f"graft_text_index_{ikey}",
        lambda tmp: append_text_index_batch(
            table(spark, sf, "documents").select("doc_id", "text"), tmp
        ),
    )
    bmidx = (
        text_index_scores(
            spark, store, list(_CS_BM25_TERMS),
            k1=_CS_BM25_K1, b=_CS_BM25_B,
        )
        .select("doc_id", F.round("score", 6).alias("__x"))
        .filter(F.col("__x") > 0)
        .select(
            F.lit("bm25_idx").alias("component"),
            F.col("doc_id").alias("k"),
            F.lit(None).cast("string").alias("s"),
            F.lit(None).cast("long").alias("n"),
            F.col("__x").alias("x"),
        )
    )

    # DSIR importance weights: target = the 'en' slice, raw = whole pool;
    # scoring is row-local against the collected (model-sized) log-ratio
    # LUT, the Gumbel top-k is TakeOrderedAndProject
    # featurize ONCE: gram construction dominates the chain (~2.2 s/pass
    # at sf1, BENCH_NOTES.md) and target counts / raw counts / scoring
    # would otherwise each pay it; the pin lasts only until `scored`
    # materializes below
    # lazy snapshot instead of persist+unpersist (r16): dl appears
    # three times in scored's plan (the raw pool, the target slice,
    # the scoring pass), so the snapshot still computes the gram
    # featurization once — but it now materializes inside whichever
    # action first consumes scored, not as an eagerly-scheduled
    # construction job the battery must wait on. (The old
    # persist+eager-checkpoint+unpersist sequencing also could not be
    # kept under a lazy scored: the unpersist ran before any action.)
    dl = featurize(
        table(spark, sf, "documents").select("doc_id", "text", "lang"),
        "text", _CS_DSIR_B, salt=_CS_DSIR_SALT,
    ).localCheckpoint(eager=False)
    lr = bucket_logratio(
        dl.filter(F.col("lang") == "en"), dl, "text",
        n_buckets=_CS_DSIR_B, salt=_CS_DSIR_SALT,
        raw_buckets_col="_dsir_buckets", target_buckets_col="_dsir_buckets",
    )
    # drop the text before checkpointing — both consumers need only
    # (doc_id, logw), so the materialized reuse point stays id-sized
    scored = (
        dsir_log_weight(
            dl, lr, "text", _CS_DSIR_B, salt=_CS_DSIR_SALT,
            buckets_col="_dsir_buckets",
        )
        .select("doc_id", "dsir_logw")
        .localCheckpoint(eager=False)
    )
    dsir = scored.select(
        F.lit("dsir").alias("component"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("long").alias("n"),
        F.round("dsir_logw", 6).alias("x"),
    )
    pick = dsir_resample(
        scored, _CS_DSIR_K, "doc_id", salt=_CS_DSIR_PICK_SALT
    ).select(
        F.lit("dsirpick").alias("component"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("long").alias("n"),
        F.round("dsir_key", 6).alias("x"),
    )

    # rdprobe (folded-in r15): the retrieval-decontamination bounded
    # probe over the persisted inverted index — shares the helper with
    # the sf10 bench drive; maps (query_id, doc_id, score, rank) into
    # the battery schema (s carries the query tag)
    rdp = _retrieval_probe_df(spark, sf).select(
        F.lit("rdprobe").alias("component"),
        F.col("doc_id").alias("k"),
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("s"),
        F.col("rank").cast("long").alias("n"),
        F.col("score").alias("x"),
    )

    # semdecon (new r15): sparse_cosine_candidates at the production
    # knob shape — rarest-first probe selection + candidate pass +
    # exact cosine + the empty-probe exhaustive fallback, all under the
    # oracle. Corpus = the same marker transform as rdprobe (the base
    # corpora's 31-type vocabulary is all corpus-common — without the
    # markers every rank would prune and ONLY the fallback would
    # exercise); bench = odd-position-words rewrites of every 53rd doc
    # (negative-mapped ids, the corpus_pipeline.semantic_decontaminate
    # convention) plus one all-common-terms literal item that MUST ride
    # the fallback.
    from hrdp_variant_load_pipeline_spark.operators.vocab import (
        sparse_cosine_candidates,
    )

    d2 = table(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" marker"),
            (F.col("doc_id") % 97).cast("string"),
        ).alias("text"),
    )
    # checkpoint the MODEL-SIZED vocab (consumed by dv2 AND bv2 —
    # unmaterialized, each embeds and re-runs the corpus vocab pass)
    # and the slim corpus vectors (sparse_cosine_candidates consumes
    # its `a` side multiple times: rank-df aggregate, inverted
    # candidate pass, exact-cosine join — and, in r15, an internal n_a
    # count that made dv2's construction a blocking job; r16 passes
    # n_a=n_corpus below, so BOTH snapshots now materialize inside the
    # battery's one union action). eager=False is load-bearing: EAGER
    # checkpoints serialized the builds as separate construction-time
    # jobs — measured 136.8 → 198.9 s at sf10 (eager) vs 129.0 s
    # (lazy, vs 136.8 unshared, r15 protocol). Values are checkpoint-
    # invariant; storage is O(vector bytes) ≪ O(text).
    sd_vocab = build_vocab(d2, "text", max_vocab=_SD_VOCAB).localCheckpoint(
        eager=False
    )
    # n_corpus (one parquet metadata count, computed once above) is
    # reused here: |d2| == |documents| (row-preserving projection)
    dv2 = tfidf_vectors(d2, "doc_id", "text", sd_vocab, n_docs=n_corpus).select(
        "doc_id", "tfidf_idx", "tfidf_val"
    ).localCheckpoint(eager=False)
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    bench = (
        table(spark, sf, "documents")
        .filter(
            (F.col("doc_id") % _SD_BENCH_MOD == _SD_BENCH_REM)
            & (F.col("doc_id") < _SD_BENCH_CAP)
        )
        .select(
            (-(F.col("doc_id").cast("long")) - 1).alias("doc_id"),
            F.concat(
                # odd 1-based positions == even 0-based indices (the
                # oracle's DuckDB list_filter index is 1-based)
                F.array_join(
                    F.filter(words, lambda w, i: i % 2 == F.lit(0)), " "
                ),
                F.lit(" marker"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("text"),
        )
        .unionByName(
            spark.createDataFrame(
                [(_SD_FALLBACK_ID, _SD_FALLBACK_TEXT)],
                "doc_id long, text string",
            )
        )
    )
    bv2 = tfidf_vectors(
        bench, "doc_id", "text", sd_vocab, n_docs=n_corpus
    ).select("doc_id", "tfidf_idx", "tfidf_val")
    # n_a=n_corpus (|dv2| == |d2| — tfidf_vectors left-joins back onto
    # its input, one vector row per doc): skips the operator's internal
    # count, which was the blocking construction-time job that
    # materialized dv2+sd_vocab before the union action existed — now
    # every semdecon subtree schedules inside the battery's one action
    sem = sparse_cosine_candidates(
        dv2,
        bv2,
        "doc_id",
        min_cosine=_SD_MIN,
        max_df_frac=_SD_FRAC,
        max_probe_terms=_SD_MPT,
        n_a=n_corpus,
    ).select(
        F.lit("semdecon").alias("component"),
        F.col("id_a").alias("k"),
        F.lit(None).cast("string").alias("s"),
        F.col("id_b").alias("n"),
        F.col("cosine").alias("x"),
    )

    return (
        parad.unionByName(spand)
        .unionByName(ngtop)
        .unionByName(cos)
        .unionByName(lm)
        .unionByName(ccnet)
        .unionByName(goph)
        .unionByName(c4)
        .unionByName(bm)
        .unionByName(bmidx)
        .unionByName(dsir)
        .unionByName(pick)
        .unionByName(rdp)
        .unionByName(sem)
    )


# -------------------------------------------------- iterative + timeseries
# PageRank (fixed 5 damped iterations over the customer-nation ->
# supplier-nation trade graph) and per-key linear resampling of the
# purchase series — the iterative-algorithm and timeseries surfaces,
# hash-gated against an UNROLLED fixed-iteration oracle (recursive
# aggregation over the rank vector is not legal SQL; five chained CTEs
# are) and a recursive-CTE bucket grid.
_ITS_ITER = 5
_ITS_DAMP = 0.85
_ITS_STEP_S = 21600  # 6 hours
_ITS_LR = 0.5
_ITS_LOGREG_ITER = 2


def _pagerank_unrolled_sql(n_iter: int, damp: float) -> str:
    parts = [
        """
edges AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nv AS (SELECT count(*)::DOUBLE AS n FROM verts),
r0 AS (SELECT v, 1.0 / nv.n AS rank FROM verts, nv)"""
    ]
    for k in range(n_iter):
        parts.append(
            f""",
i{k} AS (SELECT e.dst AS v, sum(r.rank / dg.deg) AS infl
         FROM r{k} r JOIN deg dg ON r.v = dg.src JOIN edges e ON e.src = r.v
         GROUP BY e.dst),
d{k} AS (SELECT coalesce(sum(r.rank), 0.0) AS dang
         FROM r{k} r LEFT JOIN deg dg ON r.v = dg.src WHERE dg.src IS NULL),
r{k + 1} AS (SELECT vs.v,
                    (1.0 - {damp}) / nv.n + {damp} * d{k}.dang / nv.n
                    + {damp} * coalesce(i{k}.infl, 0.0) AS rank
             FROM verts vs CROSS JOIN nv CROSS JOIN d{k}
             LEFT JOIN i{k} ON i{k}.v = vs.v)"""
        )
    return "".join(parts)


# NOTE: no WITH RECURSIVE here — under RECURSIVE, DuckDB treats the
# chained r0..r5 CTEs as mutually recursive and fixpoint-iterates them
# (measured: 500 rows, rank sum 2.3e7). The bucket grid therefore uses a
# scalar-subquery-bounded generate_series + range join, not recursion.
_ITS_SQL = f"""
WITH {_pagerank_unrolled_sql(_ITS_ITER, _ITS_DAMP)},
pr AS (SELECT v AS k, round(rank, 6) AS x FROM r{_ITS_ITER}),

feat AS (SELECT CASE WHEN o_orderpriority LIKE '1-%' THEN 1.0 ELSE 0.0 END AS y,
                o_totalprice AS f1, (o_orderkey % 7)::DOUBLE AS f2
         FROM orders),
st AS (SELECT avg(f1) AS mu1, stddev_pop(f1) AS sd1,
              avg(f2) AS mu2, stddev_pop(f2) AS sd2,
              count(*)::DOUBLE AS n
       FROM feat),
zz AS (SELECT y, (f1 - mu1) / sd1 AS z1, (f2 - mu2) / sd2 AS z2 FROM feat, st),
g0 AS (SELECT sum((0.5 - y) * z1) AS g1, sum((0.5 - y) * z2) AS g2,
              sum(0.5 - y) AS gb
       FROM zz),
wt1 AS (SELECT -{_ITS_LR} * g0.g1 / st.n AS w1, -{_ITS_LR} * g0.g2 / st.n AS w2,
               -{_ITS_LR} * g0.gb / st.n AS b
        FROM g0, st),
g1 AS (SELECT sum((1.0 / (1.0 + exp(-(wt1.w1 * z1 + wt1.w2 * z2 + wt1.b))) - y) * z1) AS g1,
              sum((1.0 / (1.0 + exp(-(wt1.w1 * z1 + wt1.w2 * z2 + wt1.b))) - y) * z2) AS g2,
              sum(1.0 / (1.0 + exp(-(wt1.w1 * z1 + wt1.w2 * z2 + wt1.b))) - y) AS gb
       FROM zz, wt1 GROUP BY wt1.w1, wt1.w2, wt1.b),
wt2 AS (SELECT wt1.w1 - {_ITS_LR} * g1.g1 / st.n AS w1,
               wt1.w2 - {_ITS_LR} * g1.g2 / st.n AS w2,
               wt1.b - {_ITS_LR} * g1.gb / st.n AS b
        FROM wt1, g1, st),
logreg AS (SELECT 0::BIGINT AS k, round(w1, 6) AS x FROM wt2
           UNION ALL SELECT 1, round(w2, 6) FROM wt2
           UNION ALL SELECT 2, round(b, 6) FROM wt2),

p AS (SELECT user_id AS key, ts, value FROM events
      WHERE event_type = 'purchase'),
ob AS (SELECT key,
              make_timestamp(((epoch_us(ts) // 1000000) // {_ITS_STEP_S})
                             * {_ITS_STEP_S} * 1000000) AS bt,
              ts, value
       FROM p),
obs AS (SELECT key, bt, max_by(value, ts) AS ov FROM ob GROUP BY key, bt),
bounds AS (SELECT key, min(epoch_us(bt) // 1000000) // {_ITS_STEP_S} AS lo,
                  max(epoch_us(bt) // 1000000) // {_ITS_STEP_S} AS hi
           FROM obs GROUP BY key),
srs AS (SELECT unnest(generate_series((SELECT min(lo) FROM bounds),
                                      (SELECT max(hi) FROM bounds))) AS h),
grid AS (SELECT b.key, make_timestamp(s.h * {_ITS_STEP_S} * 1000000) AS bt
         FROM bounds b JOIN srs s ON s.h BETWEEN b.lo AND b.hi),
j AS (SELECT grid.key, grid.bt, obs.ov
      FROM grid LEFT JOIN obs USING (key, bt)),
f AS (SELECT key, bt, ov,
        last_value(ov IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN ov IS NOT NULL THEN bt END IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        first_value(ov IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bt
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN ov IS NOT NULL THEN bt END IGNORE NULLS) OVER
          (PARTITION BY key ORDER BY bt
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM j),
rs AS (SELECT key, bt,
         CASE WHEN ov IS NOT NULL THEN ov
              WHEN next_v IS NULL THEN prev_v
              ELSE prev_v + (next_v - prev_v)
                   * (((epoch_us(bt) // 1000000) - (epoch_us(prev_t) // 1000000))
                      / (CASE WHEN (epoch_us(next_t) // 1000000)
                                   - (epoch_us(prev_t) // 1000000) > 0
                              THEN (epoch_us(next_t) // 1000000)
                                   - (epoch_us(prev_t) // 1000000)
                              ELSE 1 END))
         END AS val,
         ov IS NOT NULL AS observed
       FROM f),

-- per-user purchase-value OLS slope (the former events_user_trend row,
-- folded in r15 to keep the registry inside the driver's 50-row
-- correctness window): centered co-moments over the same purchase
-- slice as the resample component; two-stage floor-round mirrors the
-- engine (see queries_ml.events_user_trend)
utc AS (SELECT key, x - avg(x) OVER (PARTITION BY key) AS xc,
               y - avg(y) OVER (PARTITION BY key) AS yc
        FROM (SELECT key, epoch_us(ts) / 1000000.0 AS x, value AS y FROM p)),
uts AS (SELECT key, count(*) AS n, sum(xc * yc) AS sxy, sum(xc * xc) AS sxx
        FROM utc GROUP BY key)

SELECT 'pagerank' AS component, k, CAST(NULL AS TIMESTAMP) AS t, x,
       CAST(NULL AS BOOLEAN) AS b
FROM pr
UNION ALL
SELECT 'resample', key, bt, floor(val * 10000 + 0.5) / 10000, observed
FROM rs
UNION ALL
SELECT 'logreg', k, NULL, x, NULL FROM logreg
UNION ALL
SELECT 'utrend', key, NULL,
       floor(floor(sxy / sxx * 1e10 + 0.5) / 1e10 * 10000 + 0.5) / 10000, NULL
FROM uts WHERE n >= 3 AND sxx > 0
UNION ALL
SELECT 'utrend_n', key, NULL, n::DOUBLE, NULL
FROM uts WHERE n >= 3 AND sxx > 0
"""


@q("iterative_ts_battery", _ITS_SQL)
def iterative_ts_battery(spark: SparkSession, sf: str) -> DataFrame:
    from hrdp_variant_load_pipeline_spark.operators.graph import pagerank
    from hrdp_variant_load_pipeline_spark.operators.timeseries import (
        resample_interpolate,
    )

    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
    )
    pr = pagerank(edges, n_iter=_ITS_ITER, damping=_ITS_DAMP).select(
        F.lit("pagerank").alias("component"),
        F.col("vertex").cast("long").alias("k"),
        F.lit(None).cast("timestamp").alias("t"),
        F.round("rank", 6).alias("x"),
        F.lit(None).cast("boolean").alias("b"),
    )

    purchases = (
        table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
    )
    rs = resample_interpolate(
        purchases, "user_id", "ts", "value", step="6 hours", how="linear"
    ).select(
        F.lit("resample").alias("component"),
        F.col("user_id").cast("long").alias("k"),
        F.col("bucket_ts").alias("t"),
        (F.floor(F.col("value") * 10000 + F.lit(0.5)) / 10000).alias("x"),
        F.col("observed").alias("b"),
    )
    # third component: 2-iteration unrolled logistic regression (the
    # distributed trainer vs the oracle's hand-unrolled gradient steps —
    # full-batch GD is exactly reproducible at fixed iteration count)
    from hrdp_variant_load_pipeline_spark.operators.classifier import train_logreg

    o = table(spark, sf, "orders")
    feat = o.select(
        F.when(F.col("o_orderpriority").startswith("1-"), 1.0)
        .otherwise(0.0)
        .alias("y"),
        F.col("o_totalprice").alias("f1"),
        (F.col("o_orderkey") % 7).cast("double").alias("f2"),
    )
    model = train_logreg(
        feat, ["f1", "f2"], "y", n_iter=_ITS_LOGREG_ITER, lr=_ITS_LR
    )
    lr_rows = spark.createDataFrame(
        [
            (0, round(model["weights"]["f1"], 6)),
            (1, round(model["weights"]["f2"], 6)),
            (2, round(model["bias"], 6)),
        ],
        "k long, x double",
    ).select(
        F.lit("logreg").alias("component"),
        "k",
        F.lit(None).cast("timestamp").alias("t"),
        "x",
        F.lit(None).cast("boolean").alias("b"),
    )
    # fourth component (r15 consolidation): the per-user purchase-value
    # OLS slope, previously its own registered row. ONE map-combinable
    # hash aggregate (covar_pop/var_pop — plan pinned UDF-free in
    # tests/test_plan_shapes.py); lazily checkpointed because slope and
    # count project from the same user-sized aggregate.
    from hrdp_variant_load_pipeline_spark.queries_ml import events_user_trend

    ut = events_user_trend(spark, sf).localCheckpoint(eager=False)
    nulls = (F.lit(None).cast("timestamp"), F.lit(None).cast("boolean"))
    ut_slope = ut.select(
        F.lit("utrend").alias("component"),
        F.col("user_id").cast("long").alias("k"),
        nulls[0].alias("t"),
        F.col("slope").alias("x"),
        nulls[1].alias("b"),
    )
    ut_n = ut.select(
        F.lit("utrend_n").alias("component"),
        F.col("user_id").cast("long").alias("k"),
        nulls[0].alias("t"),
        F.col("n").cast("double").alias("x"),
        nulls[1].alias("b"),
    )
    return (
        pr.unionByName(rs)
        .unionByName(lr_rows)
        .unionByName(ut_slope)
        .unionByName(ut_n)
    )


# ------------------------------------------------- retrieval decon probe
# NOT @q-registered since r15 (registry consolidation): this is the
# 'rdprobe' component of corpus_stats_battery now — constants, design
# rationale and the oracle CTE block (_rdp_cte) live above
# _CORPUS_STATS_SQL. The body stays a standalone helper so the battery
# and the sf10 bench drive share one implementation.
def _retrieval_probe_df(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import os

    from hrdp_variant_load_pipeline_spark.operators.text_index import (
        append_text_index_batch,
        text_index_topk_many,
    )
    from hrdp_variant_load_pipeline_spark.queries_ml import _cached_tmp_dir

    import hrdp_variant_load_pipeline_spark.operators.text_index as _tix
    import hrdp_variant_load_pipeline_spark.operators.vocab as _voc
    import hrdp_variant_load_pipeline_spark.sources.store as _sto

    src = os.path.join(sf, "documents.parquet")
    st_ = os.stat(src)
    code_fp = hashlib.md5(
        open(_tix.__file__, "rb").read()
        + open(_voc.__file__, "rb").read()
        + open(_sto.__file__, "rb").read()
    ).hexdigest()[:8]
    # 'deconv1' tags the marker transform: same source as the bm25_idx
    # fixture, DIFFERENT corpus bytes -> its own cache key
    ikey = hashlib.md5(
        f"deconv1:{os.path.realpath(src)}:{st_.st_size}:{st_.st_mtime_ns}:"
        f"{code_fp}".encode()
    ).hexdigest()[:16]

    def _build(tmp: str) -> None:
        d2 = table(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" marker"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("text"),
        )
        append_text_index_batch(d2, tmp)

    store = _cached_tmp_dir(f"graft_decon_probe_{ikey}", _build)
    qdf = spark.createDataFrame(
        [(qid, list(terms)) for qid, terms in _RDP_QUERIES],
        "query_id long, terms array<string>",
    )
    return text_index_topk_many(
        spark,
        store,
        qdf,
        k=_RDP_K,
        k1=_RDP_K1,
        b=_RDP_B,
        max_df_frac=_RDP_FRAC,
        max_query_terms=_RDP_TERMS,
        round_digits=6,
    )
