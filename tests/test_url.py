"""URL canonicalization + registered-domain (functions/url.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.url import (
    normalize_url,
    registered_domain,
    url_host,
)


def _apply(spark, fn, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.out for r in df.select(fn(F.col("url")).alias("out")).collect()]


def test_normalize_url_canonicalizes(spark):
    got = _apply(
        spark,
        normalize_url,
        [
            "HTTP://WWW.Example.COM/Path/Page?utm_source=x&id=3&fbclid=zz#frag",
            "https://ex.com",
            "https://ex.com/a?gclid=1",
            "not a url",
            None,
        ],
    )
    assert got[0] == "http://www.example.com/Path/Page?id=3"
    assert got[1] == "https://ex.com/"
    assert got[2] == "https://ex.com/a"
    assert got[3] is None and got[4] is None


def test_normalize_url_port_handling(spark):
    got = _apply(
        spark,
        normalize_url,
        [
            "https://Ex.com:443/a",   # scheme default: stripped
            "http://ex.com:80/a",
            "https://ex.com:8443/a",  # non-default: a DIFFERENT endpoint
        ],
    )
    assert got == [
        "https://ex.com/a",
        "http://ex.com/a",
        "https://ex.com:8443/a",
    ]


def test_host_strips_credentials_and_port(spark):
    got = _apply(
        spark,
        url_host,
        ["https://user:pw@Host.Example.com:8443/x", "ftp://a.b.c/d"],
    )
    assert got == ["host.example.com", "a.b.c"]


def test_registered_domain_heuristic(spark):
    got = _apply(
        spark,
        registered_domain,
        [
            "https://news.sub.example.com/a",
            "https://www.bbc.co.uk/news",
            "https://example.com/",
            "http://10.1.2.3/x",
            "https://localhost/x",
        ],
    )
    assert got == [
        "example.com",
        "bbc.co.uk",
        "example.com",
        "10.1.2.3",
        "localhost",
    ]


def test_per_domain_cap_composition(spark):
    """The curation shape: canonical url -> registered domain ->
    per-domain cap via sample_n_per_group (exact, deterministic)."""
    from hrdp_variant_load_pipeline_spark.operators.corpus import (
        sample_n_per_group,
    )

    rows = [
        (i, f"https://sub{i % 2}.bulk.com/p{i}") for i in range(10)
    ] + [(100, "https://rare.org/x")]
    df = spark.createDataFrame(rows, "doc_id long, url string").withColumn(
        "domain", registered_domain(F.col("url"))
    )
    capped = sample_n_per_group(df, "domain", n=3, id_col="doc_id")
    counts = {
        r.domain: r.cnt
        for r in capped.groupBy("domain").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {"bulk.com": 3, "rare.org": 1}
    # plan is UDF-free: canonicalization stays in codegen
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
