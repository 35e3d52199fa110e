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
            # token with '#<rep>': that kept growth linear but gave each
            # replica a DISJOINT vocabulary (sf10 grew the bigram table
            # x100 where a real K-times corpus grows sub-linearly) and
            # the '#' characters tripped the Gopher symbol gate, so
            # quality filters dropped every replica — the staged corpus
            # measured the generator, not the engine (r11 verdict).
            #
            # v2: a per-replica DIALECT — a deterministic token->token
            # map keyed on (token type, replica) that appends one of 16
            # fixed alphabetic suffixes to every token EXCEPT a protected
            # function-word set (the union of the engine's Gopher
            # stopwords, quality-scoring stopwords, and language-ID
            # marker words — remapping those would change gate outcomes
            # per replica). Properties:
            #   * within a replica the map is a bijection on token
            #     types, so the original near-dup/exact-dup structure is
            #     preserved EXACTLY (Jaccard is invariant under token
            #     renaming) -> pair counts grow linearly in K, and every
            #     gate that reads function words (stopword hits,
            #     lang-ID) scores replicas identically to the original;
            #   * across replicas two dialects agree on a non-protected
            #     type w.p. 1/16 -> 3-shingle Jaccard ~1e-3 on content
            #     text, far below LSH candidacy -> replicas are
            #     independent documents (docs made ENTIRELY of protected
            #     words would replicate verbatim; none exist in the
            #     generated corpora);
            #   * each type maps to <= 17 variants total, so vocabulary
            #     growth saturates (~7x at K=10, ~17x at K=100 —
            #     sub-linear, vs x K for the old disjoint '#<rep>'
            #     salting) and suffixes are alphabetic, so symbol/alpha
            #     gates keep the replicas.
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
            suffixes = ", ".join(f"'z{c}'" for c in "abcdefghijklmnop")
            dialect = f"""
                CASE WHEN text IS NULL OR trim(text) = '' THEN text ELSE
                array_join(transform(
                  filter(split(text, '\\\\s+'), t -> t != ''),
                  t -> CASE
                    WHEN t IN ({plist}) THEN t
                    ELSE concat(t, element_at(array({suffixes}),
                         cast(pmod(xxhash64(t, __rep), 16) + 1 AS int)))
                  END
                ), ' ') END
            """
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.expr(dialect)
                ),
            )
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
