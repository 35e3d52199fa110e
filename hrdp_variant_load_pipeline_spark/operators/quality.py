"""Declarative data-quality constraints — the lightweight core of a
Deequ-style validator.

A load pipeline should refuse (or at least account for) bad batches
BEFORE they reach a store the reference treats as transactional truth.
Rules are plain dicts; all row-local rules (not_null / in_range / in_set
/ matches / custom predicate) evaluate in ONE aggregate pass over the
frame (a conditional sum per rule — map-side combined, no shuffle
beyond the scalar aggregate), ``unique`` adds one keyed aggregate, and
``ref`` (foreign-key) one anti-join per rule. Nothing collects beyond
per-rule scalar counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _predicate(df: DataFrame, rule: dict):
    t = rule["type"]
    if t == "not_null":
        return F.col(rule["col"]).isNotNull()
    if t == "in_range":
        c = F.col(rule["col"])
        ok = F.lit(True)
        if "min" in rule:
            ok = ok & (c >= F.lit(rule["min"]))
        if "max" in rule:
            ok = ok & (c <= F.lit(rule["max"]))
        return c.isNull() | ok  # null-ness is not_null's business
    if t == "in_set":
        c = F.col(rule["col"])
        return c.isNull() | c.isin(*rule["values"])
    if t == "matches":
        c = F.col(rule["col"])
        return c.isNull() | c.rlike(rule["pattern"])
    if t == "predicate":
        return F.expr(rule["expr"])
    raise ValueError(f"unknown rule type {t!r}")


def _rule_name(rule: dict) -> str:
    t = rule["type"]
    if t == "unique":
        return f"unique({','.join(rule['cols'])})"
    if t == "ref":
        return f"ref({rule['col']})"
    if t == "predicate":
        return f"predicate({rule['expr']})"
    return f"{t}({rule.get('col', '')})"


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (rule, violations, ok).

    Rule shapes::

        {"type": "not_null", "col": "rgd_id"}
        {"type": "in_range", "col": "start_pos", "min": 1}
        {"type": "in_set", "col": "variant_type", "values": [...]}
        {"type": "matches", "col": "chromosome", "pattern": "^([0-9]+|X|Y|MT)$"}
        {"type": "predicate", "expr": "end_pos >= start_pos"}
        {"type": "unique", "cols": ["rgd_id"]}
        {"type": "ref", "col": "sample_id", "ref_df": <DataFrame>, "ref_col": "id"}

    For range/set/pattern rules a NULL passes (pair with ``not_null`` to
    forbid it) — matching SQL CHECK-constraint semantics.

    The result is LAZY — one unioned plan, zero driver-side actions
    inside the operator (pre-r15 it collected per rule family: three
    sequential jobs for rowwise+unique+ref). One action now evaluates
    everything, and Spark schedules the independent subtrees' stages
    concurrently. Row order is not guaranteed; key by ``rule``.
    """
    spark = df.sparkSession
    for r in rules:
        _rule_name(r)  # fail loud on unknown types before any plan builds
        if r["type"] not in ("unique", "ref"):
            _predicate(df, r)
    if not rules:
        return spark.createDataFrame(
            [], "rule string, violations long, ok boolean"
        )
    rowwise = [r for r in rules if r["type"] not in ("unique", "ref")]
    branches: list[DataFrame] = []
    if rowwise:
        aggs = [
            F.sum(F.when(~_predicate(df, r), 1).otherwise(0))
            .cast("long")
            .alias(f"__r{i}")
            for i, r in enumerate(rowwise)
        ]
        # ONE aggregate row -> a stack generator fans it out to
        # (rule, violations) rows; rule names ride literal columns, so
        # no SQL-string quoting of user expressions
        pairs: list = []
        for i, r in enumerate(rowwise):
            pairs += [
                F.lit(_rule_name(r)),
                F.coalesce(F.col(f"__r{i}"), F.lit(0)).cast("long"),
            ]
        branches.append(
            df.agg(*aggs).select(
                F.stack(F.lit(len(rowwise)), *pairs).alias(
                    "rule", "violations"
                )
            )
        )
    for r in rules:
        if r["type"] == "unique":
            branches.append(
                df.groupBy(*r["cols"])
                .count()
                .filter(F.col("count") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
                .select(F.lit(_rule_name(r)).alias("rule"), "violations")
            )
        elif r["type"] == "ref":
            branches.append(
                df.filter(F.col(r["col"]).isNotNull())
                .join(
                    r["ref_df"]
                    .select(F.col(r["ref_col"]).alias(r["col"]))
                    .distinct(),
                    r["col"],
                    "left_anti",
                )
                .agg(F.count("*").cast("long").alias("violations"))
                .select(F.lit(_rule_name(r)).alias("rule"), "violations")
            )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.withColumn("ok", F.col("violations") == 0)
