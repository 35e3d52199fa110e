"""URL canonicalization + registered-domain (functions/url.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.url import (
    default_psl,
    load_public_suffixes,
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


def test_url_host_at_sign_in_query(spark):
    """Regression: '@' in the QUERY must not be read as a userinfo
    delimiter — with a greedy userinfo group 'http://ex.com?a=@b'
    mis-extracted host 'b'."""
    got = _apply(
        spark,
        url_host,
        [
            "http://ex.com?a=@b",
            "http://ex.com/p?a=@b",
            "http://ex.com#f@g",
            "http://user@ex.com?a=@b",
        ],
    )
    assert got == ["ex.com", "ex.com", "ex.com", "ex.com"]


def test_ipv6_hosts_key_whole(spark):
    """Bracketed IPv6 literals are real hosts, not dropped rows: the
    whole (lower-cased) bracketed address is the curation key."""
    got = _apply(
        spark,
        url_host,
        ["http://[2001:DB8::1]/x", "https://[::1]:8443/y", "http://[fe80::a%25eth0]/z"],
    )
    assert got == ["[2001:db8::1]", "[::1]", "[fe80::a%25eth0]"]
    assert _apply(
        spark, registered_domain, ["http://[2001:db8::1]:8080/x"]
    ) == ["[2001:db8::1]"]
    # normalize: default port collapses, non-default survives, bracketed
    # authority reassembles unambiguously
    got3 = _apply(
        spark,
        normalize_url,
        ["HTTP://[2001:DB8::1]:8080/A?utm_source=t", "http://[::1]:80/a"],
    )
    assert got3 == ["http://[2001:db8::1]:8080/A", "http://[::1]/a"]


#: literal rule set exercising every PSL rule kind (the fixture the
#: round-8/9 directives asked for): multi-label exacts, wildcard,
#: exception, an exact rule tied with a wildcard at equal effective
#: length (op.ck vs *.ck), and deep exception bases (*.kobe.jp).
_PSL_FIXTURE = [
    "// fixture snapshot",
    "com",
    "pl",
    "com.pl   // trailing comment per spec: text after whitespace ignored",
    "za",
    "co.za",
    "uk",
    "co.uk",
    "ck",
    "*.ck",
    "!www.ck",
    "op.ck",
    "jp",
    "kobe.jp",
    "*.kobe.jp",
    "!city.kobe.jp",
    "io",
    "github.io",
    "",
]


def _psl_fn(c):
    return registered_domain(c, psl=load_public_suffixes(iter(_PSL_FIXTURE)))


def test_psl_exact_multilabel_suffixes(spark):
    got = _apply(
        spark,
        _psl_fn,
        [
            "https://shop.example.com.pl/a",  # com.pl, 2-label heuristic would say example... wrong split
            "https://www.gov-site.co.za/x",
            "https://deep.sub.example.co.uk/",
            "https://example.com/",
            "https://sub.example.com/",
            "https://example.pl/",
        ],
    )
    assert got == [
        "example.com.pl",
        "gov-site.co.za",
        "example.co.uk",
        "example.com",
        "example.com",
        "example.pl",
    ]


def test_psl_wildcard_and_exception(spark):
    got = _apply(
        spark,
        _psl_fn,
        [
            "https://foo.bar.ck/",        # *.ck: suffix bar.ck → foo.bar.ck
            "https://a.foo.bar.ck/",      # still foo.bar.ck
            "https://www.ck/",            # !www.ck: registrable itself
            "https://sub.www.ck/",        # exception names the domain
            "https://a.b.city.kobe.jp/",  # !city.kobe.jp beats *.kobe.jp
            "https://city.kobe.jp/",
            "https://x.other.kobe.jp/",   # *.kobe.jp: suffix other.kobe.jp
            "https://deep.x.other.kobe.jp/",
        ],
    )
    assert got == [
        "foo.bar.ck",
        "foo.bar.ck",
        "www.ck",
        "www.ck",
        "city.kobe.jp",
        "city.kobe.jp",
        "x.other.kobe.jp",
        "x.other.kobe.jp",
    ]


def test_psl_exact_wildcard_tie_and_default_rule(spark):
    got = _apply(
        spark,
        _psl_fn,
        [
            # op.ck matches BOTH the exact rule 'op.ck' and '*.ck' at
            # effective length 2 — either way the registrable domain is
            # suffix + 1 label
            "https://x.op.ck/",
            # no rule matches 'zz': the PSL default rule '*' applies
            # (suffix = last label, registrable = last two)
            "https://a.b.example.zz/",
            "https://example.zz/",
        ],
    )
    assert got == ["x.op.ck", "example.zz", "example.zz"]


def test_psl_suffix_passthrough_pinned(spark):
    """A host that IS a public suffix keys to itself, whole — NOT null
    (tldextract-style) and NOT last-2-labels. Deliberate: bare-suffix
    pages then share one cap/dedup key distinct from every subdomain
    key. Pinned so an edit can't silently flip the choice."""
    got = _apply(
        spark,
        _psl_fn,
        ["https://github.io/", "https://bar.ck/", "https://co.uk/", "https://ck/"],
    )
    assert got == ["github.io", "bar.ck", "co.uk", "ck"]
    # ...and one label deeper is registrable as usual
    assert _apply(spark, _psl_fn, ["https://user.github.io/p"]) == [
        "user.github.io"
    ]


def test_default_psl_snapshot_loads_and_applies(spark):
    psl = default_psl()
    assert "co.uk" in psl.exact[2] and "com.pl" in psl.exact[2]
    assert "ck" in psl.wildcard_bases[1]
    assert "www.ck" in psl.exceptions[2]
    got = _apply(
        spark,
        lambda c: registered_domain(c, psl=psl),
        ["https://www.bbc.co.uk/news", "https://me.github.io/", "https://x.com.pl/"],
    )
    assert got == ["bbc.co.uk", "me.github.io", "x.com.pl"]


def test_url_curation_keys_wiring(spark, tmp_path):
    """The non-test call site: url_curation_keys wires psl_file /
    default_psl into the curation frame, UDF-free."""
    from hrdp_variant_load_pipeline_spark.operators.corpus import (
        url_curation_keys,
    )

    rows = [
        (1, "HTTPS://Blog.Example.COM.PL:443/a?utm_source=x&id=2"),
        (2, "https://me.github.io/p"),
        (3, "http://10.0.0.1/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: (r.url_norm, r.domain) for r in url_curation_keys(df).collect()}
    assert out[1] == ("https://blog.example.com.pl/a?id=2", "example.com.pl")
    assert out[2] == ("https://me.github.io/p", "me.github.io")
    assert out[3] == ("http://10.0.0.1/x", "10.0.0.1")

    # a deployment-supplied snapshot overrides the bundled subset
    snap = tmp_path / "psl.dat"
    snap.write_text("// tiny\nzz\nzip.zz\n")
    got = url_curation_keys(df, psl_file=str(snap)).collect()
    # under the tiny list 'com.pl' is no rule: default rule '*' → last 2
    assert {r.doc_id: r.domain for r in got}[1] == "com.pl"

    plan = url_curation_keys(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


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


# ---- property: PSL semantics vs an independent spec implementation ----

def _ref_etld1(host: str, raw_rules: list[str]) -> str:
    """Independent reference implementation of the publicsuffix.org
    algorithm (labels compared right-to-left, '*' matches any single
    label, exception rules prevail and name a suffix one label shorter),
    written from the spec — NOT from functions/url.py — plus this
    engine's documented deviation: a host at/below its public suffix
    passes through whole instead of returning null."""
    labels = host.split(".")
    matches = []
    for rule in raw_rules:
        rule = rule.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        neg = rule.startswith("!")
        rl = (rule[1:] if neg else rule).split(".")
        if len(rl) > len(labels):
            continue
        if all(a == "*" or a == b for a, b in zip(rl, labels[-len(rl):])):
            matches.append((neg, rl))
    exc = [rl for neg, rl in matches if neg]
    if exc:
        suf_len = max(len(rl) for rl in exc) - 1
    elif matches:
        suf_len = max(len(rl) for _, rl in matches)
    else:
        suf_len = 1  # the implicit default rule '*'
    if len(labels) <= suf_len:
        return host
    if exc:
        # exception: the registrable domain is exactly the rule's labels
        rl = max(exc, key=len)
        return ".".join(labels[-len(rl):])
    return ".".join(labels[-(suf_len + 1):])


def test_psl_property_vs_spec_reference(spark):
    import itertools
    import random

    rng = random.Random(20260814)
    base_labels = ["aa", "bb", "cc", "www", "city", "xn--p1ai"]
    tlds = ["ck", "jp", "zz", "io"]
    for trial in range(8):
        # random rule set: exacts at depth 1-3, one wildcard, one
        # exception under the wildcard
        rules = list({rng.choice(tlds) for _ in range(3)})
        for _ in range(4):
            depth = rng.randint(2, 3)
            rules.append(
                ".".join(rng.sample(base_labels, depth - 1) + [rng.choice(tlds)])
            )
        wild_base = rng.choice([r for r in rules if "." not in r])
        rules.append(f"*.{wild_base}")
        rules.append(f"!{rng.choice(base_labels)}.{wild_base}")
        # hosts: every suffix of a few random deep names, plus each
        # rule's own name and one-label-deeper variants
        hosts = set()
        for _ in range(10):
            name = rng.sample(base_labels, rng.randint(1, 4)) + [rng.choice(tlds)]
            for i in range(len(name)):
                hosts.add(".".join(name[i:]))
        for r in rules:
            bare = r.lstrip("!").replace("*.", "aa.")
            hosts.add(bare)
            hosts.add("deep." + bare)
        hosts = sorted(hosts)
        psl = load_public_suffixes(iter(rules))
        urls = [f"https://{h}/x" for h in hosts]
        got = _apply(spark, lambda c: registered_domain(c, psl=psl), urls)
        want = [_ref_etld1(h, rules) for h in hosts]
        assert got == want, (trial, rules,
                             [(h, g, w) for h, g, w in zip(hosts, got, want) if g != w])


def test_normalize_url_idempotent_property(spark):
    """A canonical form must be a fixed point: normalize(normalize(x))
    == normalize(x), and the host key must survive normalization.
    Generated over the messy-URL lattice (case, default/odd ports,
    userinfo, tracking params, fragments, trailing dots, IPv6)."""
    import random

    rng = random.Random(20260814)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = [
        "Ex.COM", "www.Example.co.uk", "a.b.c.d.example.com.",
        "10.1.2.3", "[2001:DB8::1]", "localhost",
    ]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p%20q"]
    queries = [
        "", "?utm_source=x", "?id=1&utm_medium=m&b=2", "?fbclid", "?a=@b",
        "?utm_campaign=c&gclid=1",
    ]
    frags = ["", "#frag", "#f@g"]
    urls = []
    for _ in range(80):
        urls.append(
            rng.choice(schemes) + "://"
            + rng.choice(["", "user:pw@"])
            + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        normalize_url(F.col("url")).alias("n1"),
        normalize_url(normalize_url(F.col("url"))).alias("n2"),
        url_host(F.col("url")).alias("h0"),
        url_host(normalize_url(F.col("url"))).alias("h1"),
    ).collect()
    for u, r in zip(urls, rows):
        assert r.n1 is not None, u
        assert r.n2 == r.n1, (u, r.n1, r.n2)
        assert r.h1 == r.h0, (u, r.h0, r.h1)


def test_url_curation_keys_refuses_column_clobber(spark):
    import pytest

    from hrdp_variant_load_pipeline_spark.operators.corpus import (
        url_curation_keys,
    )

    df = spark.createDataFrame(
        [(1, "https://a.co/x", "labeled")], "doc_id long, url string, domain string"
    )
    with pytest.raises(ValueError, match="domain"):
        url_curation_keys(df)
    out = url_curation_keys(df, domain_out="etld1")
    assert {"domain", "etld1"} <= set(out.columns)
