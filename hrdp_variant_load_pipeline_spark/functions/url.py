"""URL normalization and domain extraction for corpus curation.

Web-scale pretraining corpora key their dedup, per-site caps, and
blocklists on a CANONICAL url / registered domain, not the raw string
(the same page arrives as `http://WWW.Ex.com:80/a?utm_source=x#frag`
and `https://ex.com/a`). All functions here are pure Column expressions
— whole-stage codegen, no UDFs, no shuffles; compose them with
``sample_n_per_group`` (per-domain caps) and the dedup operators.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Iterable, Mapping

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
    form so both spellings share one key. Bracketed IPv6 literals
    (`http://[2001:db8::1]/x`) are accepted and keyed with their
    brackets (lower-cased hex, the RFC 5952 canonical case)."""
    # userinfo must stop at the first of /?#@ (RFC 3986): with the looser
    # [^/@]* a path-less URL carrying '@' in its QUERY ('http://ex.com?a=@b')
    # would greedily swallow 'ex.com?a=' as credentials and mis-extract 'b'.
    # The bracketed alternative must come FIRST: an IPv6 authority contains
    # ':' so the reg-name branch [^/:?#]+ would truncate it at '[2001'.
    host = F.regexp_extract(
        url,
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]/?#]*\]|[^/:?#]+)",
        1,
    )
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
        url,
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(?:\[[^\]/?#]*\]|[^/:?#]+):(\d+)",
        1,
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
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*([^#]*)", 1)
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


@dataclass(frozen=True)
class PublicSuffixes:
    """Parsed Public Suffix List rules, grouped by label count so the
    Column expression can probe each tail length with one InSet lookup.

    ``exact[k]``: normal rules with k labels ("co.uk" -> exact[2]).
    ``wildcard_bases[b]``: bases of ``*.`` rules ("*.ck" -> {1: {"ck"}});
    the implied suffix is one label longer than the base.
    ``exceptions[k]``: ``!`` rules — the named domain IS registrable.
    """

    exact: Mapping[int, frozenset] = field(default_factory=dict)
    wildcard_bases: Mapping[int, frozenset] = field(default_factory=dict)
    exceptions: Mapping[int, frozenset] = field(default_factory=dict)


def load_public_suffixes(source) -> PublicSuffixes:
    """Parse a publicsuffix.org snapshot (path or iterable of lines)
    into :class:`PublicSuffixes`. Driver-side, O(rules) — the list is
    ~10k lines; the result is inlined into the expression as InSet
    literals (hash-set probe per row, still whole-stage codegen).

    Handles comments (``//``), blank lines, wildcard rules (``*.ck``)
    and exception rules (``!www.ck``). Punycode/IDN labels are kept
    verbatim — hosts are matched lower-cased, byte-wise, which is what
    a corpus-curation key needs (not cosmetic IDN display forms).
    """
    if isinstance(source, (str, bytes)):
        with open(source, "r", encoding="utf-8") as fh:
            lines: Iterable[str] = fh.readlines()
    else:
        lines = source
    exact: dict[int, set] = {}
    wild: dict[int, set] = {}
    exc: dict[int, set] = {}
    for raw in lines:
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0]  # spec: everything after whitespace ignored
        if line.startswith("!"):
            name = line[1:]
            exc.setdefault(name.count(".") + 1, set()).add(name)
        elif line.startswith("*."):
            base = line[2:]
            wild.setdefault(base.count(".") + 1, set()).add(base)
        else:
            exact.setdefault(line.count(".") + 1, set()).add(line)
    return PublicSuffixes(
        exact={k: frozenset(v) for k, v in exact.items()},
        wildcard_bases={k: frozenset(v) for k, v in wild.items()},
        exceptions={k: frozenset(v) for k, v in exc.items()},
    )


#: bundled snapshot subset (see the file header for provenance + the
#: drop-in-a-full-snapshot upgrade path)
_SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "psl_snapshot.dat")


@functools.lru_cache(maxsize=1)
def default_psl() -> PublicSuffixes:
    """The bundled ``psl_snapshot.dat`` rule set, parsed once per
    process. This is what ``url_curation_keys`` (operators/corpus.py)
    uses when no ``psl_file`` is supplied — full PSL semantics
    (wildcards, exceptions, multi-label suffixes) out of the box, with
    a curated high-traffic subset standing in for the ~10k-line
    production snapshot a deployment ships."""
    return load_public_suffixes(_SNAPSHOT_PATH)


def _last_k(labels: Column, n: Column, k: int) -> Column:
    """Dot-joined last k host labels; null when the host has fewer than
    k labels (concat_ws would silently skip the null element_at's and
    produce a SHORTER string that could spuriously match a rule)."""
    tail = F.concat_ws(".", *[F.element_at(labels, -i) for i in range(k, 0, -1)])
    return F.when(n >= k, tail)


def registered_domain(url: Column, psl: PublicSuffixes | None = None) -> Column:
    """eTLD+1: the per-site cap / blocklist / dedup grouping key.

    Without ``psl`` (the no-data default): last two host labels, or last
    THREE when the two-label tail is a known multi-part public suffix
    (co.uk, com.au, … — a 19-suffix builtin subset). With ``psl`` (a
    :func:`load_public_suffixes` result): full PSL semantics — longest
    matching rule wins, exception rules name the registrable domain
    itself, wildcard rules extend the suffix by one label. IP hosts and
    hosts at-or-below the matched suffix pass through whole. Pure
    Column expression either way: rule sets become InSet literals, so
    the probe is one hash-set lookup per tail length, zero UDFs.
    """
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # dotted-quad IPv4 or a bracketed IPv6 literal: no registrable domain
    # structure — the whole address is the key (bracketed form kept, so
    # the key round-trips into normalize_url's authority unambiguously)
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.startswith("[")
    if psl is None:
        last2 = _last_k(labels, n, 2)
        last3 = _last_k(labels, n, 3)
        multi = F.array([F.lit(t) for t in _MULTI_TLDS])
        return (
            F.when(host.isNull(), F.lit(None).cast("string"))
            .when(is_ip | (n <= 2), host)
            .when(F.array_contains(multi, last2), last3)
            .otherwise(last2)
        )

    out = F.when(host.isNull(), F.lit(None).cast("string")).when(is_ip, host)
    # Exceptions outrank everything at any length (PSL spec §algorithm):
    # '!www.ck' means www.ck itself is the registrable domain.
    for k in sorted(psl.exceptions, reverse=True):
        tail = _last_k(labels, n, k)
        out = out.when(tail.isin(*sorted(psl.exceptions[k])), tail)
    # Then the longest matching suffix wins. Interleave wildcard rules
    # (suffix = base + 1 label) and exact rules by EFFECTIVE suffix
    # length, descending, so '*.kobe.jp' (3) beats 'jp' (1).
    probes = [("wild", b + 1, b) for b in psl.wildcard_bases] + [
        ("exact", k, k) for k in psl.exact
    ]
    for kind, suf_len, key in sorted(probes, key=lambda t: -t[1]):
        rules = sorted(
            psl.wildcard_bases[key] if kind == "wild" else psl.exact[key]
        )
        tail = _last_k(labels, n, key)
        hit = tail.isin(*rules)
        # host no deeper than the suffix itself → no registrable part;
        # pass the host through whole (consistent with the builtin's
        # n<=2 behavior for 'localhost' / bare TLD inputs)
        out = out.when(hit & (n <= suf_len), host).when(
            hit, _last_k(labels, n, suf_len + 1)
        )
    # default rule '*': suffix is the last single label
    return out.when(n <= 2, host).otherwise(_last_k(labels, n, 2))
