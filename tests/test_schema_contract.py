"""Schema contract for the driver-generated testdata.

The driver regenerates /root/testdata between rounds and physical parquet
types have silently drifted before (events.ts: TIMESTAMP(NANOS) -> bigint
round 3, timestamp[us] -> TIMESTAMP_NTZ round 4, breaking three queries).
This pins the *canonical* dtypes every query assumes AFTER loading through
``sources.tables.table`` — a regeneration that changes physical types must
either be absorbed by the normalizer or fail here, loudly, before the
driver's correctness run.
"""

from __future__ import annotations

import os

import pytest

from hrdp_variant_load_pipeline_spark.sources.tables import TABLE_NAMES, table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)

# canonical (column, dtype) pins per table: every column a query touches
# with a type-sensitive function, pinned at the dtypes the queries are
# known-green against today. dtype is Spark simpleString.
CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int", "n_name": "string"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_brand": "string"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderdate": "timestamp_ntz",
        "o_totalprice": "double",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts MUST come out as session-zoned timestamp whatever the parquet
    # physical type is — this is the row that catches the next NTZ/nanos
    # style drift (see normalize_ts).
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_dtypes_match_contract(spark, name):
    df = table(spark, SF_DIR, name)
    actual = dict(df.dtypes)
    pins = CONTRACT[name]
    mismatches = {
        col: (want, actual.get(col))
        for col, want in pins.items()
        if actual.get(col) != want
    }
    assert not mismatches, (
        f"testdata drift in {name}: {mismatches} (column -> (expected, actual)). "
        "If the driver changed a physical type, extend sources.tables "
        "normalization so queries keep seeing the canonical dtype."
    )


def test_embedding_dimension_contract(spark):
    """The cosine/IVF oracles hardcode generate_series(1, 64): a driver
    regeneration that changes the embedding dimension must fail here, not
    as a silent value mismatch in the correctness gate."""
    from pyspark.sql import functions as F

    e = table(spark, SF_DIR, "embeddings")
    dims = e.select(F.size("embedding").alias("d")).agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    ).collect()[0]
    assert (dims["lo"], dims["hi"]) == (64, 64), (
        f"embedding dim drifted to [{dims['lo']}, {dims['hi']}]; update the "
        "generate_series bounds in queries_ml oracle SQL"
    )


def test_documents_lang_value_set_contract(spark):
    """corpus_prep_battery's sampling fractions and the lang-ID markers
    assume this stratum set; new/renamed strata fall to the 0.0 default on
    BOTH engines (still consistent) but should be a conscious decision."""
    langs = {
        r["lang"]
        for r in table(spark, SF_DIR, "documents").select("lang").distinct().collect()
    }
    assert langs <= {"en", "de", "es", "fr", "zh"}, f"new strata: {langs}"
