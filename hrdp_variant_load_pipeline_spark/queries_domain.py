"""Domain-semantics parity queries — cross-engine checks of the reference's
normalization rules (SURVEY.md §1.4) on literal VALUES.

The Spark side runs the engine's actual column-expression libraries
(functions/normalize.py, functions/zygosity.py, operators/interval_join.py);
the oracle side is an INDEPENDENTLY written SQL derivation of the same
Java semantics. Agreement pins the quirks (snp-vs-snv, copy-path start/end
arithmetic, PAR windows, replaceFirst behavior) across two implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.normalize import (
    derive_strain_name,
    normalize_allele,
)
from hrdp_variant_load_pipeline_spark.functions.zygosity import zygosity_struct
from hrdp_variant_load_pipeline_spark.operators.interval_join import with_exists_flag
from hrdp_variant_load_pipeline_spark.sources.tables import table

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# every branch of the 9-way typing, single-allele AND copy path
NORMALIZE_CASES = [
    # (copy_ref, orig_ref, var, raw_start, is_copy)
    ("A", "A", "G", 100, False),
    ("AT", "AT", "GC", 100, False),
    ("ACG", "ACG", "*", 100, False),
    ("ACG", "ACG", "A", 100, False),
    ("ACGT", "ACGT", "AC", 100, False),
    ("A", "A", "ACG", 100, False),
    ("AC", "AC", "ACGT", 100, False),
    ("ACGT", "ACGT", "TG", 100, False),
    ("AC", "AC", "GTCA", 100, False),
    ("A", "A", "G", 100, True),
    ("AT", "AT", "GC", 100, True),
    ("ACG", "ACG", "*", 100, True),
    ("ACG", "ACG", "A", 100, True),
    ("ACG", "ACG", "AC", 100, True),
    ("A", "A", "ACG", 100, True),
    ("AC", "AC", "ACGT", 100, True),
    ("ACGT", "ACGT", "TG", 100, True),
    ("AC", "AC", "GTCA", 100, True),
]


def _values_clause(rows):
    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    return ", ".join("(" + ", ".join(fmt(v) for v in r) + ")" for r in rows)


_NORMALIZE_SQL = f"""
WITH t(copy_ref, orig_ref, var, raw_start, is_copy) AS (VALUES {_values_clause(NORMALIZE_CASES)}),
p AS (
  SELECT *, length(copy_ref) AS lref, length(var) AS lvar,
         CASE WHEN is_copy THEN orig_ref ELSE copy_ref END AS ref2,
         length(CASE WHEN is_copy THEN orig_ref ELSE copy_ref END) AS lref2
  FROM t),
b AS (
  SELECT *,
    CASE WHEN var = '*' THEN 1
         WHEN lref > lvar AND lvar = 1 THEN 2
         WHEN lref2 > lvar AND starts_with(ref2, var) THEN 3
         WHEN lvar > lref AND lref = 1 THEN 4
         WHEN lvar > lref2 AND starts_with(var, ref2) THEN 5
         WHEN lref = lvar AND lref > 1 THEN 6
         WHEN lref = lvar THEN 7
         WHEN lref > lvar THEN 8
         ELSE 9 END AS br
  FROM p)
SELECT copy_ref, orig_ref, var, is_copy,
  CASE br WHEN 1 THEN 'deletion' WHEN 2 THEN 'deletion' WHEN 3 THEN 'deletion'
          WHEN 4 THEN 'insertion' WHEN 5 THEN 'insertion' WHEN 6 THEN 'mnv'
          WHEN 7 THEN CASE WHEN is_copy THEN 'snp' ELSE 'snv' END
          ELSE 'delins' END AS variant_type,
  CASE br WHEN 1 THEN copy_ref WHEN 2 THEN substring(copy_ref, 2)
          WHEN 3 THEN substring(ref2, lvar + 1)
          WHEN 4 THEN NULL WHEN 5 THEN NULL ELSE copy_ref END AS ref_nuc,
  CASE br WHEN 1 THEN NULL WHEN 2 THEN NULL WHEN 3 THEN NULL
          WHEN 4 THEN substring(var, 2) WHEN 5 THEN substring(var, lref2 + 1)
          ELSE var END AS var_nuc,
  CASE br WHEN 2 THEN var WHEN 3 THEN var WHEN 4 THEN ref2 WHEN 5 THEN ref2
          ELSE NULL END AS padding_base,
  CAST(CASE br WHEN 2 THEN CASE WHEN is_copy THEN raw_start ELSE raw_start + 1 END
               WHEN 3 THEN raw_start + lvar
               WHEN 4 THEN CASE WHEN is_copy THEN raw_start ELSE raw_start + 1 END
               WHEN 5 THEN raw_start + lref2
               ELSE raw_start END AS BIGINT) AS start_pos,
  CAST(CASE br WHEN 1 THEN raw_start + lref
               WHEN 2 THEN CASE WHEN is_copy THEN raw_start + lref - 1 ELSE raw_start + lref END
               WHEN 3 THEN CASE WHEN is_copy THEN raw_start + lref2 - lvar ELSE raw_start + lref END
               WHEN 4 THEN CASE WHEN is_copy THEN raw_start + 1 ELSE raw_start + 2 END
               WHEN 5 THEN CASE WHEN is_copy THEN raw_start + 1 ELSE raw_start + lref2 + 1 END
               WHEN 6 THEN raw_start + lref
               WHEN 7 THEN raw_start + 1
               WHEN 8 THEN raw_start + lref
               ELSE raw_start + 1 END AS BIGINT) AS end_pos
FROM b
"""


def variant_normalize_branches(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(
        NORMALIZE_CASES,
        "copy_ref string, orig_ref string, var string, raw_start long, is_copy boolean",
    )
    n = normalize_allele(
        F.col("copy_ref"), F.col("orig_ref"), F.col("var"), F.col("raw_start"), F.col("is_copy")
    )
    return df.select("copy_ref", "orig_ref", "var", "is_copy", n.alias("n")).select(
        "copy_ref", "orig_ref", "var", "is_copy", "n.*"
    )


ZYGOSITY_CASES = [
    (41, 41, "U", "1", 100),
    (9, 41, "U", "1", 100),
    (5, 41, "U", "1", 100),
    (35, 41, "U", "1", 100),
    (17, 20, "U", "1", 100),
    (0, 10, "U", "1", 100),
    (10, 0, "U", "1", 100),
    (20, 20, "M", "X", 1000),
    (17, 20, "M", "X", 1000),
    (20, 20, "M", "X", 3000000),
    (17, 20, "M", "X", 3000000),
    (1, 20, "M", "X", 3000000),
    (20, 20, "M", "Y", 57443438),
    (20, 20, "P", "X", 3000000),
    (20, 20, "F", "X", 3000000),
    (3, 20, "M", "Y", 60000000),
]

_ZYGOSITY_SQL = f"""
WITH t(var_freq, depth, gender, chrom, pos) AS (VALUES {_values_clause(ZYGOSITY_CASES)}),
p AS (SELECT *, CASE WHEN depth = 0 THEN 0.0 ELSE var_freq * 100.0 / depth END AS pct FROM t),
x AS (SELECT *,
        gender IN ('M','P') AND chrom IN ('X','Y') AS sexb,
        (chrom = 'X' AND (pos BETWEEN 1 AND 2709520 OR pos BETWEEN 154584238 AND 154913754))
        OR (chrom = 'Y' AND (pos BETWEEN 1 AND 2709520 OR pos BETWEEN 57443438 AND 57772954))
          AS in_par
      FROM p)
SELECT var_freq, depth, gender, chrom, pos,
  CASE WHEN sexb AND NOT in_par THEN
        CASE WHEN pct = 100 THEN 'hemizygous'
             WHEN pct >= 85 THEN 'probably hemizygous'
             ELSE 'possibly hemizygous' END
       ELSE
        CASE WHEN pct = 100 THEN 'homozygous'
             WHEN pct >= 85 THEN 'possibly homozygous'
             ELSE 'heterozygous' END END AS zygosity_status,
  CAST(floor(pct + 0.5) AS INTEGER) AS zygosity_percent_read,
  CASE WHEN pct <= 15 THEN 'Y' ELSE 'N' END AS zygosity_poss_error,
  CASE WHEN sexb AND in_par THEN 'Y' ELSE 'N' END AS zygosity_in_pseudo
FROM x
"""


def zygosity_ladder(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(
        ZYGOSITY_CASES, "var_freq int, depth int, gender string, chrom string, pos long"
    )
    z = zygosity_struct(
        F.col("var_freq"), F.col("depth"), F.col("gender"), F.col("chrom"), F.col("pos")
    )
    return df.select("var_freq", "depth", "gender", "chrom", "pos", z.alias("z")).select(
        "var_freq", "depth", "gender", "chrom", "pos", "z.*"
    )


STRAIN_FILES = [
    ("BN_NHsdMcwi_2019_v1_sorted_PASS.vcf.gz",),
    ("SHR_OlaIpcv_XX_2019_v1_sorted_PASS.vcf.gz",),
    ("ACI_EurMcwi_2019_v2_final.vcf.gz",),
    ("WKY_NCrl_A_B_2020_v1_sorted_PASS.vcf.gz",),
]

_STRAIN_SQL = f"""
WITH t(fname) AS (VALUES {_values_clause(STRAIN_FILES)}),
s1 AS (SELECT fname, replace(fname, '_PASS', '') AS s FROM t),
s2 AS (SELECT fname, regexp_replace(s, '_[^_]*$', '') AS s FROM s1),
s3 AS (SELECT fname, regexp_replace(s, '_[^_]*$', '') || ')' AS s FROM s2),
s4 AS (SELECT fname,
        CASE WHEN length(s) - length(replace(s, '_', '')) > 2
             THEN regexp_replace(s, '_', '-') ELSE s END AS s  -- first match only
       FROM s3),
s5 AS (SELECT fname, regexp_replace(s, '_', '/') AS s FROM s4)
SELECT fname, replace(s, '_', ' (') AS strain FROM s5
"""


def strain_names(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(STRAIN_FILES, "fname string")
    return df.select("fname", derive_strain_name(F.col("fname")).alias("strain"))


# The three literal-VALUES semantics checks above (9-branch allele
# normalization F8, zygosity ladder, strain-name derivation F9) ride ONE
# driver row in long format — same coverage (every case, every output
# field, nulls made explicit via a sentinel so a null/empty drift cannot
# hide in concat), one window slot. The underlying queries stay
# individually callable for tests.
_NULL = "<null>"


def _pipe(*cols):
    return F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )


_DOMAIN_BATTERY_SQL = f"""
WITH n AS ({_NORMALIZE_SQL}),
z AS ({_ZYGOSITY_SQL}),
s AS ({_STRAIN_SQL})
SELECT 'normalize' AS component,
       concat_ws('|', coalesce(copy_ref, '{_NULL}'), coalesce(orig_ref, '{_NULL}'),
                 coalesce(var, '{_NULL}'),
                 coalesce(is_copy::VARCHAR, '{_NULL}')) AS case_id,
       concat_ws('|', coalesce(variant_type, '{_NULL}'),
                 coalesce(ref_nuc, '{_NULL}'), coalesce(var_nuc, '{_NULL}'),
                 coalesce(padding_base, '{_NULL}'),
                 coalesce(start_pos::VARCHAR, '{_NULL}'),
                 coalesce(end_pos::VARCHAR, '{_NULL}')) AS result
FROM n
UNION ALL
SELECT 'zygosity',
       concat_ws('|', coalesce(var_freq::VARCHAR, '{_NULL}'),
                 coalesce(depth::VARCHAR, '{_NULL}'),
                 coalesce(gender, '{_NULL}'), coalesce(chrom, '{_NULL}'),
                 coalesce(pos::VARCHAR, '{_NULL}')),
       concat_ws('|', coalesce(zygosity_status, '{_NULL}'),
                 coalesce(zygosity_percent_read::VARCHAR, '{_NULL}'),
                 coalesce(zygosity_poss_error, '{_NULL}'),
                 coalesce(zygosity_in_pseudo, '{_NULL}'))
FROM z
UNION ALL
SELECT 'strain', coalesce(fname, '{_NULL}'), coalesce(strain, '{_NULL}') FROM s
"""


@q("domain_semantics_battery", _DOMAIN_BATTERY_SQL)
def domain_semantics_battery(spark: SparkSession, sf: str) -> DataFrame:
    n = variant_normalize_branches(spark, sf).select(
        F.lit("normalize").alias("component"),
        _pipe("copy_ref", "orig_ref", "var", "is_copy").alias("case_id"),
        _pipe(
            "variant_type",
            "ref_nuc",
            "var_nuc",
            "padding_base",
            "start_pos",
            "end_pos",
        ).alias("result"),
    )
    z = zygosity_ladder(spark, sf).select(
        F.lit("zygosity").alias("component"),
        _pipe("var_freq", "depth", "gender", "chrom", "pos").alias("case_id"),
        _pipe(
            "zygosity_status",
            "zygosity_percent_read",
            "zygosity_poss_error",
            "zygosity_in_pseudo",
        ).alias("result"),
    )
    s = strain_names(spark, sf).select(
        F.lit("strain").alias("component"),
        F.col("fname").alias("case_id"),
        F.coalesce(F.col("strain"), F.lit(_NULL)).alias("result"),
    )
    return n.unionByName(z).unionByName(s)


def _interval_sides(spark: SparkSession, sf: str):
    c = table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    s = table(spark, sf, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 50).alias("lo"),
        (F.col("s_acctbal") + 50).alias("hi"),
    )
    return c, s


# the binned (scale-path) interval join strategy, same semantics as the
# broadcast form — equi key on (chromosome, bin) + residual range filter;
# acctbal coordinates are negative-capable, exercising floor binning
@q(
    "interval_join_binned_counts",
    """
    SELECT c.c_custkey, count(*) AS n_overlap
    FROM customer c JOIN supplier s
      ON c.c_acctbal >= s.s_acctbal - 50 AND c.c_acctbal <= s.s_acctbal + 50
    GROUP BY c.c_custkey
    """,
)
def interval_join_binned_counts(spark: SparkSession, sf: str) -> DataFrame:
    from hrdp_variant_load_pipeline_spark.operators.interval_join import (
        interval_join_binned,
    )

    c, s = _interval_sides(spark, sf)
    probes = c.withColumn("k", F.lit(1))
    iv = s.withColumn("k", F.lit(1))
    pairs = interval_join_binned(
        probes,
        iv,
        bin_size=100,
        probe_keys=("k", "c_acctbal", "c_acctbal"),
        interval_keys=("k", "lo", "hi"),
    )
    return pairs.groupBy("c_custkey").agg(F.count("*").alias("n_overlap"))


# genic-status flag via the loader's actual exists-interval operator,
# demonstrated on the star schema: customer balance point vs supplier
# ±50 intervals (J3/F10 shape)
@q(
    "genic_interval_flag",
    """
    SELECT c.c_custkey,
           CASE WHEN EXISTS (SELECT 1 FROM supplier s
                             WHERE c.c_acctbal >= s.s_acctbal - 50
                               AND c.c_acctbal <= s.s_acctbal + 50)
                THEN 'GENIC' ELSE 'INTERGENIC' END AS status
    FROM customer c
    """,
)
def genic_interval_flag(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    s = table(spark, sf, "supplier").select(
        (F.col("s_acctbal") - 50).alias("lo"), (F.col("s_acctbal") + 50).alias("hi")
    )
    # point probe: q_start == q_stop == c_acctbal; same-chromosome equi key
    # replaced by a constant key (one "chromosome")
    probes = c.withColumn("k", F.lit(1))
    iv = s.withColumn("k", F.lit(1))
    flagged = with_exists_flag(
        probes,
        iv,
        flag="hit",
        probe_keys=("k", "c_acctbal", "c_acctbal"),
        interval_keys=("k", "lo", "hi"),
    )
    return flagged.select(
        "c_custkey", F.when(F.col("hit"), "GENIC").otherwise("INTERGENIC").alias("status")
    )
