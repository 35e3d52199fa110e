"""Hub-skew drill where AQE CANNOT re-split (r14 verdict stretch #8).

The r14 hub-CC drill measured only 13% for explicit skew routing
because AQE's skew-join handling already splits the hot post-shuffle
partition on local[32]. This drill stages the DOCUMENTED case where
that optimizer must decline: a skewed sort-merge join whose output
partitioning is REUSED by a same-key downstream aggregate. Splitting
the hot partition there would break the join output's hash
distribution and force an extra shuffle, so with the default
``spark.sql.adaptive.forceOptimizeSkewedJoin=false`` AQE skips the
split and the hot key's rows funnel through ONE task across the
join AND the agg. An explicit ``adaptive_salted_join`` breaks that
chain deliberately: the salted join spreads the hot key over
``salt`` tasks, and the downstream agg pays one exchange of
map-side-combined partials (one row per key per partition) instead
of a straggler.

Strategies (identical results asserted before timing):

  aqe_skew   plain join + same-key agg, AQE on (skew handling armed
             but structurally declined — the case under test)
  adaptive   operators.skew.adaptive_salted_join + same-key agg

Uses the sf10_skew staging from tools/skew_drill.py (one orderkey
holding ~20% of 60M rows). The broadcast path is closed the same way
the SMJ case closes it at 100 TB: orders is 6M rows (~180 MB), far
over the broadcast threshold.

Usage: python tools/skew_noreuse_drill.py [SKEW_DIR] [SF10_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HOT_KEY = 1


def main() -> None:
    skew_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10_skew"
    )
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf10"
    from pyspark.sql import functions as F

    from hrdp_variant_load_pipeline_spark.operators.skew import (
        adaptive_salted_join,
    )
    from hrdp_variant_load_pipeline_spark.session import get_spark

    spark = get_spark("skew-noreuse-drill")
    li_path = os.path.join(skew_dir, "lineitem.parquet")
    if not os.path.exists(li_path):
        raise SystemExit(
            f"{li_path} missing — stage it first: python tools/skew_drill.py"
        )

    def fact():
        return spark.read.parquet(li_path).select(
            F.col("l_orderkey").alias("k"), "l_extendedprice", "l_quantity"
        )

    def dim():
        return spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select(F.col("o_orderkey").alias("k"), "o_orderpriority")

    def plain():
        j = fact().join(dim(), "k")
        return j.groupBy("k", "o_orderpriority").agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )

    def adaptive():
        j = adaptive_salted_join(
            fact(), dim(), ["k"], salt=16, hot_threshold_frac=0.05
        )
        return j.groupBy("k", "o_orderpriority").agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )

    # value identity before any timing (totals + row count)
    def digest(df):
        r = df.agg(
            F.count("*").alias("rows"),
            F.sum("n").alias("n_tot"),
            F.round(F.sum("rev"), 2).alias("rev_tot"),
        ).collect()[0]
        return (r["rows"], r["n_tot"], float(r["rev_tot"]))

    d_plain, d_adapt = digest(plain()), digest(adaptive())
    # exact on counts; relative-tolerant on the float sum (60M-double
    # summation order differs across partitionings — FP reassociation,
    # not a correctness signal)
    assert d_plain[:2] == d_adapt[:2], (d_plain, d_adapt)
    assert abs(d_plain[2] - d_adapt[2]) <= 1e-9 * abs(d_plain[2]), (
        d_plain,
        d_adapt,
    )

    times = {}
    for name, build in (("aqe_skew", plain), ("adaptive", adaptive)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr, flush=True)

    # evidence that AQE declined the split on the plain path: the
    # executed plan's SMJ node is not marked isSkew and the same-key
    # agg rides the join's partitioning (no exchange between them)
    pdf = plain()
    pdf.write.format("noop").mode("overwrite").save()
    executed = pdf._jdf.queryExecution().executedPlan().toString()
    out = {
        "metric": "skew_noreuse_drill",
        "skew_dir": skew_dir,
        "rows": d_plain[1],
        "digest": {"groups": d_plain[0], "rev_tot": d_plain[2]},
        "spark": times,
        "plain_plan_skew_marked": "isSkew=true" in executed
        or "skew=true" in executed,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
