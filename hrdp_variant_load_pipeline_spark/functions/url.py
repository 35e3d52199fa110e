"""URL normalization and domain extraction for corpus curation.

Web-scale pretraining corpora key their dedup, per-site caps, and
blocklists on a CANONICAL url / registered domain, not the raw string
(the same page arrives as `http://WWW.Ex.com:80/a?utm_source=x#frag`
and `https://ex.com/a`). All functions here are pure Column expressions
— whole-stage codegen, no UDFs, no shuffles; compose them with
``sample_n_per_group`` (per-domain caps) and the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: multi-label public suffixes the 2-label heuristic would split wrong.
#: A deliberately small, well-known subset (the full PSL is a data file
#: a deployment ships alongside); anything absent falls back to the
#: last-two-labels rule.
_MULTI_TLDS = (
    "co.uk ac.uk gov.uk org.uk co.jp ne.jp or.jp com.au net.au org.au "
    "com.br com.cn com.mx com.tr co.in co.kr com.sg com.hk co.nz"
).split()


def url_host(url: Column) -> Column:
    """Lower-cased host (authority minus credentials and port); a
    trailing-dot FQDN ('example.com.') canonicalizes to the dotless
    form so both spellings share one key."""
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    return F.when(host != "", F.regexp_replace(F.lower(host), r"\.$", ""))


def normalize_url(url: Column) -> Column:
    """Canonical form: lower-cased scheme+host, default ports stripped,
    fragment stripped, tracking params (utm_*, fbclid, gclid) removed,
    trailing ``?`` dropped, and a bare host gets its ``/`` path.

    Null/scheme-less inputs return null (callers quarantine or keep raw).
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(url)
    port = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:(\d+)", 1
    )
    # non-default ports are a DIFFERENT endpoint and must survive; only
    # the scheme default collapses into the canonical form
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    hostport = F.when(
        keep_port, F.concat(host, F.lit(":"), port)
    ).otherwise(host)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/?#]*([^#]*)", 1)
    # split path?query at the FIRST '?', scrub tracking params,
    # reassemble (substring_index with -1 would split at the LAST '?'
    # and silently drop everything between two question marks)
    qpos = F.instr(rest, "?")
    path = F.when(qpos > 0, F.substr(rest, F.lit(1), qpos - 1)).otherwise(rest)
    query = F.when(qpos > 0, F.substr(rest, qpos + 1, F.length(rest))).otherwise(
        F.lit("")
    )
    kept_params = F.filter(
        F.split(query, "&"),
        # (=|$): link shorteners emit VALUELESS trackers ('?fbclid');
        # requiring '=' would let those split the canonical key
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[a-zA-Z0-9_]*|fbclid|gclid)(=|$)"),
    )
    qs = F.array_join(kept_params, "&")
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    out = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path_norm,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme.isNotNull() & (scheme != "") & host.isNotNull(), out)


def registered_domain(url: Column) -> Column:
    """eTLD+1 heuristic: last two host labels, or last THREE when the
    two-label tail is a known multi-part public suffix (co.uk, com.au,
    …). IP hosts pass through whole. The per-site cap / blocklist key.
    """
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    multi = F.array([F.lit(t) for t in _MULTI_TLDS])
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 2), host)
        .when(F.array_contains(multi, last2), last3)
        .otherwise(last2)
    )
