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
            # salt every token with the replica id (replica 0 unchanged):
            # verbatim-replicated texts would make every replica pair a
            # true duplicate and near-dup pair counts grow QUADRATICALLY
            # with K — a data artifact, not engine scaling. Salting keeps
            # the near-dup graph K independent copies of the original
            # (linear growth), which is what real corpus growth looks like.
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.expr(
                        r"regexp_replace(text, '(\\S+)', "
                        r"concat('$1#', cast(__rep AS string)))"
                    )
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
