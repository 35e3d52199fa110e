"""Corpus ingest/egress: JSONL document reading with corrupt-line
quarantine, and size-balanced shard export for packed training data.

Web-scale corpora arrive as (gzipped) JSONL; at 100 TB some lines ARE
malformed — truncated uploads, encoding damage, embedded newlines — and
the job must neither die on them (ANSI-style abort) nor silently drop
them (they vanish from accounting). The reader keeps every input line:
good rows parse, bad rows land in a quarantine frame with the raw line
preserved for replay after repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: documents-table JSONL schema (mirrors the parquet testdata contract)
DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING"

_CORRUPT = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    recursive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read (gzipped) JSONL documents under ``path``.

    Returns ``(docs, quarantine)``: ``docs`` carries the schema'd rows;
    ``quarantine`` one ``raw`` string column per unparseable line.

    Parsing is ``from_json`` over a text scan, NOT ``spark.read.json``:
    the JSON reader's internal corrupt column cannot be queried on its
    own (``QUERY_ONLY_CORRUPT_RECORD_COLUMN`` — quarantine counts and
    selects would need the whole frame cached), while ``from_json`` is an
    ordinary expression, so both frames are plain single-pass projections
    of the same line scan. Explicit schema means no inference pass; no
    line ever aborts the job.

    Gzip inputs are unsplittable (one task per file) — corpora should
    arrive as many files; restage to parquet for repeated scans (same
    guidance as the VCF path, ``sources/vcf.py``).
    """
    reader = spark.read
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return split_jsonl_lines(reader.text(path), schema)


def split_jsonl_lines(
    lines: DataFrame, schema: str = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Split a one-string-column (``value``) line frame into (docs,
    quarantine) — the parsing core of ``read_jsonl_docs``, reusable on a
    streaming micro-batch (``readStream.text`` emits the same shape)."""
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.from_json(
            F.col("value"),
            f"{schema}, {_CORRUPT} STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("d"),
    )
    bad = F.col("d").isNull() | F.col(f"d.{_CORRUPT}").isNotNull()
    docs = parsed.filter(~bad).select("d.*").drop(_CORRUPT)
    quarantine = parsed.filter(bad).select("raw")
    return docs, quarantine


def write_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    n_shards: int | None = None,
    order_col: str | None = None,
) -> None:
    """Export size-balanced training shards: range-partition on
    ``shard_col`` (e.g. the ``bin_id`` from ``pack_sequences``) so each
    output file holds a contiguous, disjoint shard range, optionally
    sorted by ``order_col`` within files — the layout a data loader
    streams sequentially without a shuffle on its side.

    One shuffle (the range exchange), then a straight parquet write.
    ``n_shards`` defaults to the session's shuffle parallelism.
    """
    spark = df.sparkSession
    if n_shards is None:
        sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
        n_shards = max(1, int(sp) if sp.isdigit() else 32)
    out = df.repartitionByRange(n_shards, shard_col)
    out = out.sortWithinPartitions(
        shard_col, *( [order_col] if order_col else [] )
    )
    out.write.mode("overwrite").parquet(path)
