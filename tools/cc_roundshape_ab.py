"""A/B: connected_components round shape — current (join + groupBy +
label-carry join = 3 node-sized exchanges/round, edges re-shuffled every
round) vs a union-form round (join + ONE aggregate carrying the self row
= 2 exchanges/round) over edges pre-partitioned by the join key (dst), so
the per-round join never re-shuffles the edge set.

Both forms run over the SAME checkpointed pair set (minhash LSH pairs of
the documents table), alternating reps, value-identity asserted on every
rep. Usage: python tools/cc_roundshape_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_HERE))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hrdp_variant_load_pipeline_spark.operators import dedup as DD  # noqa: E402
from hrdp_variant_load_pipeline_spark.session import get_spark, tune_for_tables  # noqa: E402
from hrdp_variant_load_pipeline_spark.sources.tables import table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def cc_union_form(pairs: DataFrame, a_col="doc_a", b_col="doc_b", max_iter=25) -> DataFrame:
    """Union-form min-label propagation (candidate rewrite)."""
    sc = pairs.sparkSession.sparkContext
    with DD._REGISTRY_LOCK:
        seen = DD._persistent_rdd_ids(sc)
        sp = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        edges = (
            pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
            .unionByName(
                pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
            )
            .distinct()
            # pre-partition by the per-round join key: one extra exchange
            # now, zero edge exchanges per round (the persisted frame's
            # hashpartitioning(dst, sp) satisfies every round's join)
            .repartition(sp, "dst")
            .persist()
        )
        try:
            edges.count()
            seen |= DD._persistent_rdd_ids(sc)
            labels = DD._truncate_lineage(
                edges.groupBy("src").agg(
                    F.least(F.col("src"), F.min("dst")).alias("label")
                ).select(F.col("src").alias("node"), "label"),
                False,
            )
            prev_round = DD._persistent_rdd_ids(sc) - seen
            seen |= prev_round
            for _ in range(max_iter):
                neighbor = edges.join(labels, edges.dst == labels.node).select(
                    "src", "label", F.lit(None).cast(labels.schema["label"].dataType).alias("__self")
                )
                self_rows = labels.select(
                    F.col("node").alias("src"), "label", F.col("label").alias("__self")
                )
                stepped = DD._truncate_lineage(
                    neighbor.unionByName(self_rows)
                    .groupBy("src")
                    .agg(F.min("label").alias("label"), F.max("__self").alias("__old"))
                    .select(F.col("src").alias("node"), "label", "__old"),
                    False,
                    eager=False,
                )
                changed = (
                    stepped.filter(F.col("__old") != F.col("label")).limit(1).count()
                )
                this_round = DD._persistent_rdd_ids(sc) - seen
                seen |= this_round
                labels = stepped.drop("__old")
                DD._unpersist_rdd_ids(sc, prev_round)
                prev_round = this_round
                if changed == 0:
                    break
        finally:
            edges.unpersist()
    return labels.select(F.col("node").alias("doc"), F.col("label").alias("cluster"))


def main() -> None:
    spark = get_spark("cc_roundshape_ab")
    tune_for_tables(spark, SF_DIR, ["documents"])
    docs = table(spark, SF_DIR, "documents")
    reg: list = []
    pairs = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=6, band_rows=2,
        verify_threshold=0.5, cache_registry=reg,
    )
    n_pairs = pairs.count()
    print(f"# pairs: {n_pairs}", file=sys.stderr)

    def run(fn, tag):
        t0 = time.perf_counter()
        out = fn(pairs)
        rows = sorted(map(tuple, out.collect()))
        el = time.perf_counter() - t0
        print(f"# {tag}: {el:.3f}s rows={len(rows)}", file=sys.stderr)
        return el, rows

    base_times, new_times = [], []
    ref = None
    for i in range(REPS):
        eb, rb = run(lambda p: DD.connected_components(p), "current")
        en, rn = run(cc_union_form, "union  ")
        if ref is None:
            ref = rb
        assert rb == ref and rn == ref, "VALUE MISMATCH between CC forms"
        base_times.append(eb)
        new_times.append(en)
    print(
        f"RESULT current best={min(base_times):.3f} all={[round(t,3) for t in base_times]}\n"
        f"RESULT union   best={min(new_times):.3f} all={[round(t,3) for t in new_times]}"
    )
    for h in reg:
        h.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
