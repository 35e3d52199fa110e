"""Command-line entry point — the reference's ``Manager.main`` dispatch
(``Manager.java:16-26``): ``--runLoad`` and ``--genicQc`` subcommands, a
config file instead of Spring XML.

Config (JSON; see sources/config.py):

.. code-block:: json

    {
      "map_key": 372,
      "input_dir": "/data/vcfs",
      "samples": {"SAMPLE_NAME": 101, "...": 102},
      "genes_path": "/stores/genes",
      "variant_store": "/stores/variants",
      "detail_store": "/stores/details",
      "catalogs": {"rgd": {"genes": "/stores/genes"},
                   "carpenovo": {"variant": "/stores/variants"}}
    }

``catalogs`` (optional) registers stores as external tables under named
catalog databases — the reference's dual RGD / "CarpeNovo" datasources
(``DAO.java:34-36``) as Spark namespaces.

Stores are partitioned Parquet directories (created on first load); genes
is any Parquet with the GENE schema (or loaded via JDBC upstream).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession

from hrdp_variant_load_pipeline_spark import schemas
from hrdp_variant_load_pipeline_spark.operators.upsert import merge_update
from hrdp_variant_load_pipeline_spark.plans.genic_qc import genic_qc, scope_from_vcf
from hrdp_variant_load_pipeline_spark.plans.load import load_metrics, run_load
from hrdp_variant_load_pipeline_spark.session import get_spark, tune_for_input
from hrdp_variant_load_pipeline_spark.sources.config import load_config, samples_dimension
from hrdp_variant_load_pipeline_spark.sources.sinks import write_parquet_store
from hrdp_variant_load_pipeline_spark.sources.tables import register_catalog_namespaces
from hrdp_variant_load_pipeline_spark.sources.vcf import (
    read_restaged,
    read_vcf,
    restage_to_parquet,
)


def _read_store(spark: SparkSession, path: str, schema) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def _vcf_input(spark: SparkSession, cfg: dict) -> DataFrame:
    """Parsed VCF rows for this run, restaged when ``restage_dir`` is set.

    Gzip text is unsplittable (1 task/file), so every pass over the raw
    drop is bounded by the largest file. With ``restage_dir`` in the
    config, the first run pays that scan once and writes splittable,
    columnar parquet; this run and every later one (re-loads, genic QC
    scoping) read the restage instead — column-pruned, arbitrarily
    parallel. The restage is keyed by a ``_SUCCESS`` marker: delete the
    directory to force a re-stage after new files land.
    """
    dest = cfg.get("restage_dir")
    if not dest:
        return read_vcf(spark, cfg["input_dir"])
    # ONE probe for local and remote stores: the _SUCCESS marker through the
    # Hadoop FS API. Probing by "does a read succeed" accepted a partially
    # written restage from a crashed prior run as the full input (silently
    # dropping variants), and its bare except turned transient I/O errors
    # into a restage-overwrite; the marker is only committed on job success,
    # and real I/O errors now propagate.
    jpath = spark._jvm.org.apache.hadoop.fs.Path(dest.rstrip("/") + "/_SUCCESS")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        restage_to_parquet(read_vcf(spark, cfg["input_dir"]), dest)
    return read_restaged(spark, dest)


def _register_catalogs(spark: SparkSession, cfg: dict) -> None:
    """Optional ``"catalogs"`` config key: ``{db: {table: parquet_path}}``.

    Mirrors the reference's dual datasources (default RGD + "CarpeNovo"
    variant DB, ``DAO.java:34-36``) as catalog databases of external
    tables, so deployment queries keep their qualified names
    (``carpenovo.variant``, ``rgd.genes``)."""
    if cfg.get("catalogs"):
        register_catalog_namespaces(spark, cfg["catalogs"])


def cmd_run_load(spark: SparkSession, cfg: dict) -> dict[str, int]:
    vcf = _vcf_input(spark, cfg)
    genes = spark.read.parquet(cfg["genes_path"])
    samples = samples_dimension(spark, cfg["samples"], cfg["map_key"])
    vstore = _read_store(spark, cfg["variant_store"], schemas.VARIANT)
    dstore = _read_store(spark, cfg["detail_store"], schemas.VARIANT_SAMPLE_DETAIL)

    res = run_load(vcf, genes, samples, vstore, dstore, map_key=cfg["map_key"])
    write_parquet_store(res.new_variants, cfg["variant_store"])
    write_parquet_store(res.new_sample_details, cfg["detail_store"])
    return load_metrics(res)


def _atomic_replace_store(df: DataFrame, store_path: str) -> None:
    """Replace a parquet store with ``df`` without an unreadable window.

    The previous overwrite-in-place (``localCheckpoint().write.mode(
    "overwrite")``) destroyed the store before the new files were durable:
    an executor/driver loss mid-write left NO readable store. Instead the
    new store is fully written to a sibling temp dir (reads still see the
    untouched original — no checkpoint needed), then swapped in with two
    metadata-only Hadoop FS renames. A crash before the first rename
    leaves the original untouched; between the renames the prior version
    survives at ``<store>.__old__`` for manual recovery. A real MERGE sink
    (Delta/Iceberg) would make the swap a single atomic commit.
    """
    spark = df.sparkSession
    base = store_path.rstrip("/")
    tmp, old = base + ".__new__", base + ".__old__"
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(base).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    path = lambda p: jvm.org.apache.hadoop.fs.Path(p)  # noqa: E731
    for stale in (tmp, old):  # leftovers from a previous crashed swap
        fs.delete(path(stale), True)
    df.write.mode("overwrite").parquet(tmp)
    if not fs.exists(path(tmp + "/_SUCCESS")):
        raise RuntimeError(f"store replacement aborted: no _SUCCESS in {tmp}")
    if fs.exists(path(base)) and not fs.rename(path(base), path(old)):
        raise RuntimeError(f"could not move {base} aside to {old}")
    if not fs.rename(path(tmp), path(base)):
        # put the original back so the store stays readable
        fs.rename(path(old), path(base))
        raise RuntimeError(f"could not promote {tmp} to {base}")
    fs.delete(path(old), True)


def cmd_genic_qc(spark: SparkSession, cfg: dict) -> dict[str, int]:
    genes = spark.read.parquet(cfg["genes_path"])
    store = spark.read.parquet(cfg["variant_store"])
    scope = None
    if cfg.get("input_dir"):
        scope = scope_from_vcf(_vcf_input(spark, cfg))
    updates = genic_qc(store, genes, map_key=cfg["map_key"], scope=scope)
    n = updates.count()
    if n:
        repaired = merge_update(store, updates, "rgd_id", ["genic_status"])
        _atomic_replace_store(repaired, cfg["variant_store"])
    return {"genic_status_updated": n}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="hrdp-variants-spark")
    parser.add_argument("--runLoad", action="store_true")
    parser.add_argument("--genicQc", action="store_true")
    parser.add_argument("--config", required=True)
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    spark = get_spark("hrdp-variants-cli")
    try:
        # pick the runtime profile (AQE / shuffle sizing) from the input
        # corpus size, same decision the bench harness makes per dataset
        profile_dir = cfg.get("restage_dir") or cfg.get("input_dir")
        if profile_dir and os.path.isdir(profile_dir):
            tune_for_input(spark, profile_dir)
        _register_catalogs(spark, cfg)
        if args.runLoad:
            out = cmd_run_load(spark, cfg)
        elif args.genicQc:
            out = cmd_genic_qc(spark, cfg)
        else:
            parser.error("one of --runLoad / --genicQc is required")
        for k, v in out.items():
            print(f"{k}: {v}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
