"""Equivalence pins for the r15 codegen rewrites in operators/textops.py.

The optimization round replaced two interpreted higher-order-function
expressions with single-regex codegen forms; these tests pin the new
forms against the ORIGINAL HOF expressions on real documents plus the
edge cases (NULL / empty / all-whitespace / adjacent stopwords /
punctuation-glued tokens / non-ASCII stopwords / case folding).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from physicsnemo_curator_spark.operators import textops

EDGE_TEXTS = [
    (None,),
    ("",),
    ("   ",),
    ("the",),
    ("the the the",),
    ("the, and. of",),
    ("  the\tand\nof  ",),
    ("für die das",),
    ("THE AND",),
    ("a the b",),
    ("x" * 500,),
    ("the-and and_the theand",),
]


def _old_ws_token_count(text):
    return F.when(F.length(textops._norm_ws(text)) == 0, F.lit(0)).otherwise(
        F.size(textops.ws_tokens(text))
    )


def _old_stopword_ratio(text, lang):
    toks = textops.ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*textops.STOPWORDS[lang])))
    n = _old_ws_token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def _frames(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    edge = spark.createDataFrame(EDGE_TEXTS, "text string")
    return [docs, edge]


def test_ws_token_count_regexp_equivalence(spark, sf_correctness_dir):
    t = F.col("text")
    for df in _frames(spark, sf_correctness_dir):
        bad = df.where(
            ~(
                (textops.ws_token_count(t) == _old_ws_token_count(t))
                | (
                    textops.ws_token_count(t).isNull()
                    & _old_ws_token_count(t).isNull()
                )
            )
        ).count()
        assert bad == 0


def test_stopword_ratio_regexp_equivalence(spark, sf_correctness_dir):
    t = F.col("text")
    for df in _frames(spark, sf_correctness_dir):
        for lang in sorted(textops.STOPWORDS):
            new = textops.stopword_ratio(t, lang)
            old = _old_stopword_ratio(t, lang)
            bad = df.where(
                ~((new == old) | (new.isNull() & old.isNull()))
            ).count()
            assert bad == 0, lang
