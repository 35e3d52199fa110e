"""Generate a scaled-up copy of the sf0.1 testdata (~sf1) for crossover
benchmarking: each fact/dim table is replicated K times with key offsets
that preserve referential integrity (orderkey/custkey/suppkey/partkey all
shift together), so the join queries stay semantically intact at 10x the
rows. Output is written as multi-file parquet so the Spark scan
parallelizes (the single-file sf0.1 inputs cap every scan at one task).

Usage: python tools/make_scaled_sf.py [K] [OUT_DIR]
Defaults: K=10, OUT_DIR=/tmp/hrdp_scaled_sf1
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from hrdp_variant_load_pipeline_spark.session import get_spark  # noqa: E402
from hrdp_variant_load_pipeline_spark.sources.tables import (  # noqa: E402
    invalidate_tables,
    table,
)

SRC = "/root/testdata/sf0.1"

# per-table key columns that must shift per replica to keep joins intact
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def generate(spark, k: int = 10, out: str = "/tmp/hrdp_scaled_sf1") -> None:
    """Write the K-replica scaled copy of sf0.1 under ``out`` using an
    existing session (bench.py stages its sf1 leg through this)."""
    # one offset base per key FAMILY, shared across tables so foreign keys
    # stay aligned (orders.o_custkey shifts exactly like customer.c_custkey)
    base: dict[str, int] = {}
    for tname, keys in KEYED.items():
        df = table(spark, SRC, tname)
        for key in keys:
            fam = key.split("_", 1)[-1]  # custkey / orderkey / suppkey / ...
            if fam not in base:
                m = df.agg(F.max(key)).collect()[0][0]
                base[fam] = int(m) + 1

    replicas = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep")
    for tname, keys in KEYED.items():
        df = table(spark, SRC, tname).select("*", replicas)
        for key in keys:
            fam = key.split("_", 1)[-1]
            df = df.withColumn(
                key, (F.col(key) + F.col("__rep") * F.lit(base[fam])).cast("long")
            )
        if tname == "documents":
            # Verbatim replicas would make every replica pair a true
            # duplicate — near-dup pair counts growing QUADRATICALLY in K
            # is a data artifact, not engine scaling. v1 salted EVERY
            # token with '#<rep>': disjoint per-replica vocabulary and
            # the '#' tripped the Gopher symbol gate (r11 verdict). v2
            # remapped token TYPES through 16 per-replica dialect
            # suffixes: linear pair growth and gate-stable, but the
            # source corpus has only 31 word types, so the staged corpus
            # topped out at ~494 types — flat df everywhere, the
            # declared WORST CASE for retrieval/df-dependent rows (r13
            # verdict #1).
            #
            # v3: hierarchical context-keyed Zipf OCCURRENCE expansion.
            # Every non-protected token occurrence maps to concat(t, z).
            # The rank z = floor(R^u) with u = hash(ctx, replica)
            # uniform in [0,1) — R^u is the inverse CDF of Zipf(s=1)
            # over [1, R), so contexts land on rank z w.p. ~1/(z ln R).
            # The CONTEXT granularity is itself drawn per (t, prev,
            # replica): 25% unigram (t), 25% bigram (t, prev), 50%
            # trigram (t, prev, prev2). Three context levels have
            # per-context token masses ~3 decades apart (all of t /
            # one bigram / one trigram), and each level's head ranks
            # aggregate many contexts (~1/z), so the superposition is a
            # power law spanning ~3.5 decades instead of the 1/z-head +
            # flat-tail a single level gives (bigram-only measured
            # slope -0.58; the 3-level form near -1 — measured numbers
            # in BENCH_NOTES r14). Protected function words (Gopher +
            # quality stopwords + lang-ID markers) stay verbatim so
            # every gate that reads them scores replicas like the
            # original. Properties:
            #   * within a replica the map is a deterministic function
            #     of (t, prev, prev2): exact duplicates stay exact;
            #     near-dups sharing token spans keep those spans'
            #     shingles identical except <=2 tokens past each edit
            #     boundary -> dup/near-dup structure preserved, pair
            #     growth linear in K;
            #   * across replicas every draw is keyed on __rep: two
            #     replicas agree on an occurrence only by same-rank
            #     coincidence (head-heavy, ~1.5% per token; ~3e-6 per
            #     3-shingle) -> replicas are independent documents, far
            #     below LSH candidacy;
            #   * df is now DISCRIMINATIVE: head ranks are corpus-wide
            #     common terms (exercising max_df_frac pruning), tail
            #     ranks are rare and query-selective — what BM25/
            #     retrieval rows need to measure representatively;
            #   * suffix digits keep words letter-bearing and
            #     alphanumeric, so alpha/symbol/punct gates keep the
            #     replicas (digits don't count as symbols).
            from hrdp_variant_load_pipeline_spark.functions.text import (
                GOPHER_STOPWORDS,
                LANG_MARKERS,
                STOPWORDS,
            )

            protected = sorted(
                set(GOPHER_STOPWORDS)
                | set(STOPWORDS)
                | {w for ws in LANG_MARKERS.values() for w in ws}
            )
            plist = ", ".join(f"'{w}'" for w in protected)
            zipf_r = 65536
            df = df.withColumn(
                "__toks", F.expr(r"filter(split(text, '\\s+'), t -> t != '')")
            )
            prev = "if(i = 0, '^', element_at(__toks, i))"
            prev2 = "if(i < 2, '^', element_at(__toks, i - 1))"
            ctx = f"""CASE pmod(xxhash64(9001, t, {prev}, __rep), 4)
                      WHEN 0 THEN xxhash64(t, __rep)
                      WHEN 1 THEN xxhash64(t, {prev}, __rep)
                      ELSE xxhash64(t, {prev}, {prev2}, __rep) END"""
            zipf_map = f"""
                CASE WHEN text IS NULL OR trim(text) = '' THEN text ELSE
                array_join(transform(
                  __toks,
                  (t, i) -> CASE
                    WHEN t IN ({plist}) THEN t
                    ELSE concat(t, cast(pow({zipf_r},
                         pmod({ctx}, 1000000) / 1000000.0) AS bigint))
                  END
                ), ' ') END
            """
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.expr(zipf_map)
                ),
            ).drop("__toks")
        (
            df.drop("__rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/{tname}.parquet")
        )
        print(f"wrote {tname} x{k}", file=sys.stderr)
    for tname in COPY:
        table(spark, SRC, tname).write.mode("overwrite").parquet(
            f"{out}/{tname}.parquet"
        )
        print(f"wrote {tname} (unscaled dim)", file=sys.stderr)
    # any table plans cached against OUT before/while restaging now pin a
    # stale file listing — drop them so same-app readers re-list
    invalidate_tables(out)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hrdp_scaled_sf1"
    spark = get_spark("make-scaled-sf")
    generate(spark, k, out)
    spark.stop()


if __name__ == "__main__":
    main()
