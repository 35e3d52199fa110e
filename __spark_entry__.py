"""Driver contract for the PySpark engine.

``entry`` runs the flagship query at sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (plus the training-data extensions);
``oracle_sql`` gives the DuckDB-equivalent SQL for each — including the
Structured Streaming entries, whose outputs over the finite fixture are
deterministic batch relations (complete-mode agg, single-micro-batch
update totals, keys-only dedup).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hrdp_variant_load_pipeline_spark.queries_core import REGISTRY as CORE  # noqa: E402
from hrdp_variant_load_pipeline_spark.queries_domain import REGISTRY as DOMAIN  # noqa: E402
from hrdp_variant_load_pipeline_spark.queries_ml import REGISTRY as ML  # noqa: E402
from hrdp_variant_load_pipeline_spark.queries_model import REGISTRY as MODEL  # noqa: E402

_ALL = {**CORE, **DOMAIN, **ML, **MODEL}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    fn, _ = _ALL["q1_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
