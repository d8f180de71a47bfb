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
