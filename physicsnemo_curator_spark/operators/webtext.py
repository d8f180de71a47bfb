"""Web-page text extraction — HTML to training text, JVM-side.

The step between WARC ingest (``sources/warc.py``) and the text
curation family: strip markup, surface the title, and score
boilerplate via link density.  The whole chain is built from
``regexp_replace`` / ``regexp_extract_all`` Catalyst expressions —
it runs inside whole-stage codegen (no Python in the hot path, no
shuffle) and every pattern is dialect-portable (Java regex ≡ RE2),
which is what lets the driver gate replay the extraction verbatim
in DuckDB.

Scope is the honest regex subset: comments, script/style/noscript
subtree removal, block-element newlines, tag stripping, the common
named entities, and whitespace normalization.  It does NOT build a
DOM — malformed nesting degrades gracefully (a tag is a tag), which
is the right trade at crawl scale where a C parser's strictness
loses documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_TAGS = (
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article|header|"
    "footer|blockquote|pre|form"
)

# (pattern, replacement) — applied in order; all RE2-compatible
_STRIP_CHAIN = [
    (r"(?s)<!--.*?-->", " "),
    # the whole <head> subtree is chrome, not content (title has its
    # own extractor); unterminated heads degrade to tag-stripping
    (r"(?is)<head\b[^>]*>.*?</head>", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript>", " "),
    (rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: &amp;lt; must become &lt;, not <
]

_WS_CHAIN = [
    (r"[ \t\x0B\f\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\n+|\n+$", ""),  # F.trim only strips spaces, not newlines
]


def _decode_entities(col: Column) -> Column:
    for src, dst in _ENTITIES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def html_text(col: Column) -> Column:
    """Markup-stripped, entity-decoded, whitespace-normalized text."""
    for pat, rep in _STRIP_CHAIN:
        col = F.regexp_replace(col, pat, rep)
    col = _decode_entities(col)
    for pat, rep in _WS_CHAIN:
        col = F.regexp_replace(col, pat, rep)
    return F.trim(col)


def html_title(col: Column) -> Column:
    """The first ``<title>`` body, entity-decoded and trimmed."""
    return F.trim(
        _decode_entities(
            F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
        )
    )


def link_density(col: Column) -> Column:
    """Fraction of extracted characters living inside ``<a>``
    anchors — the classic boilerplate/navigation signal (link-heavy
    pages are menus, not prose).  0.0 for empty pages."""
    anchor_texts = F.regexp_extract_all(
        col, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1)
    )
    anchor_chars = F.aggregate(
        F.transform(anchor_texts, lambda s: F.length(html_text(s))),
        F.lit(0).cast("long"),
        lambda acc, n: acc + n,
    )
    total = F.length(html_text(col))
    return F.when(total > 0, anchor_chars / total).otherwise(F.lit(0.0))


def extract_web_text(
    df: DataFrame, *, html_col: str = "html", prefix: str = ""
) -> DataFrame:
    """Append ``text`` / ``title`` / ``link_density`` columns
    extracted from raw HTML — all whole-stage-codegen expressions."""
    col = F.col(html_col)
    return (
        df.withColumn(f"{prefix}text", html_text(col))
        .withColumn(f"{prefix}title", html_title(col))
        .withColumn(
            f"{prefix}link_density", F.round(link_density(col), 9)
        )
    )


# ---------------------------------------------------------------------------
# URL normalization (the crawl-dedup key discipline)

_TRACKING = r"utm_[^=&#]*|gclid|fbclid|msclkid|mc_eid"


def normalize_url(col: Column) -> Column:
    """Canonical URL form for dedup keys and frontier filtering:
    lowercase scheme+authority, default :80/:443 ports dropped,
    tracking parameters (utm_*, gclid, fbclid, ...) removed, fragment
    stripped, empty query remnants cleaned.  Pure Catalyst regex
    chain; patterns avoid lookaround so they stay RE2-portable for
    the oracle replay."""
    # fragment first — everything after # never reaches the server
    u = F.regexp_replace(col, r"#.*$", "")
    # lowercase ONLY scheme://authority (the path is case-sensitive)
    head_pat = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    head = F.lower(F.regexp_extract(u, head_pat, 1))
    tail = F.regexp_replace(u, head_pat, "")
    u = F.concat(head, tail)
    # default ports — the port colon is the one AFTER any userinfo's
    # colon, so allow an optional user[:pass]@ prefix
    u = F.regexp_replace(
        u, r"^(http://(?:[^/@?#]*@)?[^/:?#]*):80($|[/?#])", r"$1$2"
    )
    u = F.regexp_replace(
        u, r"^(https://(?:[^/@?#]*@)?[^/:?#]*):443($|[/?#])", r"$1$2"
    )
    # tracking parameters live in the QUERY component only — '&k=v'
    # sequences are legal in paths, so split at the first '?' and
    # clean just the query (mid '&k=v', leading 'k=v&' promoting the
    # next parameter, bare 'k=v')
    pre = F.regexp_replace(u, r"\?.*$", "")
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    q = F.regexp_replace(q, rf"&(?:{_TRACKING})=[^&]*", "")
    q = F.regexp_replace(q, rf"^(?:{_TRACKING})=[^&]*&", "")
    q = F.regexp_replace(q, rf"^(?:{_TRACKING})=[^&]*$", "")
    q = F.regexp_replace(q, r"[&]+$", "")
    return F.when(q != "", F.concat(pre, F.lit("?"), q)).otherwise(pre)


def url_host(col: Column) -> Column:
    """The authority's host (port and userinfo dropped)."""
    return F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )


def url_domain(col: Column) -> Column:
    """Last-two-labels registered-domain APPROXIMATION (a real
    public-suffix list is a data dependency; two labels is the
    honest no-list fallback and documents as such)."""
    host = url_host(col)
    return F.when(
        host.rlike(r"\.[^.]+\.[^.]+$"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)


def with_normalized_urls(
    df: DataFrame, *, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Append ``url_norm`` / ``host`` / ``domain`` columns — the
    dedup-key triple every crawl pipeline derives first."""
    col = F.col(url_col)
    norm = normalize_url(col)
    return (
        df.withColumn(f"{prefix}url_norm", norm)
        .withColumn(f"{prefix}host", url_host(norm))
        .withColumn(f"{prefix}domain", url_domain(norm))
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl-frontier politeness filtering

import re as _re


def _robots_lines(content: str):
    """The shared robots.txt line tokenizer: comment-stripped
    (field, value) pairs, lowercased field names."""
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        yield field.strip().lower(), value.strip()


def parse_robots(content: str, user_agent: str = "*") -> list:
    """Parse a robots.txt body into the rule list applying to
    ``user_agent``: the most specific matching group wins (an exact
    product-token group beats ``*``; RFC 9309 §2.2.1), rules are
    ``(kind, path_pattern)`` with kind allow/disallow.  Comments,
    blank lines and unknown directives are tolerated."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_group_body = False
    for field, value in _robots_lines(content):
        if field == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if value:
                rules.append((field, value))
            elif field == "disallow":
                pass  # empty Disallow: allow-all marker, no rule
    if agents or rules:
        groups.append((agents, rules))
    exact = [r for a, r in groups if ua in a]
    if exact:
        return [rule for r in exact for rule in r]
    starred = [r for a, r in groups if "*" in a]
    return [rule for r in starred for rule in r]


import functools as _functools


@_functools.lru_cache(maxsize=4096)
def _robots_pattern(pattern: str):
    """Compile one path pattern: '*' wildcards, trailing '$' anchor,
    everything else literal; match is anchored at the path start.
    LRU-cached — robots_allowed runs per (URL x rule) in the filter
    kernel and must not recompile in the hot loop."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(_re.escape(part) for part in body.split("*"))
    return _re.compile("^" + rx + ("$" if anchored else ""))


def robots_allowed(path: str, rules: list) -> bool:
    """RFC 9309 evaluation: the longest (most octets) matching
    pattern wins; an allow/disallow tie at equal length is allow;
    no match is allow."""
    best_len = -1
    best_allow = True
    for kind, pattern in rules:
        if _robots_pattern(pattern).match(path):
            plen = len(pattern)
            allow = kind == "allow"
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def filter_robots(
    urls: DataFrame,
    robots: DataFrame,
    *,
    user_agent: str = "*",
    url_col: str = "url",
    robots_host_col: str = "host",
    robots_text_col: str = "robots_txt",
    keep_unmatched: bool = True,
) -> DataFrame:
    """Politeness filter: join each URL's host to its robots.txt
    (robots is the SMALL side — one row per host — broadcast it) and
    keep URLs the evaluated rules allow.  Hosts without a robots row
    are allowed when ``keep_unmatched`` (the RFC's unreachable-file
    default).  Rule evaluation is an Arrow-batched kernel with a
    per-batch compiled-rule cache keyed on host."""
    joined = urls.withColumn("_host", url_host(F.col(url_col))).join(
        F.broadcast(
            robots.select(
                F.col(robots_host_col).alias("_host"),
                F.col(robots_text_col).alias("_robots"),
            )
        ),
        on="_host",
        how="left",
    )

    def batches(it):
        import pandas as pd  # noqa: F401

        cache: dict = {}
        for pdf in it:
            keep = []
            for url, txt in zip(pdf[url_col], pdf["_robots"]):
                if txt is None:
                    keep.append(bool(keep_unmatched))
                    continue
                rules = cache.get(txt)
                if rules is None:
                    rules = parse_robots(txt, user_agent)
                    cache[txt] = rules
                m = _re.match(
                    r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", url
                )
                path = m.group(1) or "/" if m else url
                keep.append(robots_allowed(path, rules))
            pdf = pdf.copy()
            pdf["_allowed"] = keep
            yield pdf

    schema = ", ".join(
        [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in joined.schema
        ]
        + ["_allowed boolean"]
    )
    return (
        joined.mapInPandas(batches, schema)
        .filter(F.col("_allowed"))
        .drop("_host", "_robots", "_allowed")
    )


def robots_directives(content: str) -> dict:
    """Non-group robots.txt directives: ``sitemaps`` (all Sitemap:
    lines, any group) and per-group ``crawl_delay`` seconds keyed by
    user-agent token — the frontier scheduler's inputs."""
    sitemaps: list[str] = []
    delays: dict[str, float] = {}
    agents: list[str] = []
    in_body = False  # rules/delays seen since the last agent header
    for field, value in _robots_lines(content):
        if field == "sitemap" and value:
            sitemaps.append(value)
        elif field == "user-agent":
            if in_body:
                agents = []  # a body line closed the previous group
                in_body = False
            agents.append(value.lower())
        elif field == "crawl-delay" and value:
            in_body = True
            # a delay OUTSIDE any group is ignored, matching
            # parse_robots' RFC 9309 outside-group rule
            try:
                for a in agents:
                    delays[a] = float(value)
            except ValueError:
                pass
        elif field in ("allow", "disallow"):
            in_body = True
    return {"sitemaps": sitemaps, "crawl_delay": delays}
