"""Distributed BPE training (operators/bpe.py) vs a scalar reference
implementation, greedy-merge semantics, encoder consistency."""

from __future__ import annotations

import pytest

from physicsnemo_curator_spark.operators.bpe import (
    bpe_tokenize,
    pair_counts,
    train_bpe,
    vocabulary,
)

CORPUS = [
    "low lower lowest",
    "new newer newest",
    "wide wider widest",
    "low low low new new wide",
]


def _ref_train(texts: list[str], n_merges: int):
    """Scalar reference: same counting and tie-breaking."""
    toks = [list(t) for t in texts]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for seq in toks:
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = (
                    counts.get((seq[i], seq[i + 1]), 0) + 1
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        out_toks = []
        for seq in toks:
            res, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(seq[i])
                    i += 1
            out_toks.append(res)
        toks = out_toks
        merges.append(
            {
                "rank": rank, "a": a, "b": b, "count": n,
                "n_tokens": sum(len(s) for s in toks),
            }
        )
    return merges, toks


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_scalar_reference(spark):
    got = train_bpe(_docs(spark), n_merges=8)
    ref, _ = _ref_train(CORPUS, 8)
    assert got == ref


def test_pair_counts_are_overlapping_adjacent(spark):
    df = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    from physicsnemo_curator_spark.operators.bpe import _chars_df

    rows = {
        (r["a"], r["b"]): r["n"]
        for r in pair_counts(_chars_df(df, "text")).collect()
    }
    assert rows == {("a", "a"): 2}


def test_greedy_left_to_right_merge(spark):
    df = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    merges = train_bpe(df, n_merges=1)
    assert merges[0]["a"] == "a" and merges[0]["b"] == "a"
    assert merges[0]["n_tokens"] == 2  # [aa, a], non-overlapping greedy


def test_tokenize_consistent_with_training(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=6)
    encoded = bpe_tokenize(docs, merges)
    total = sum(len(r["tokens"]) for r in encoded.collect())
    assert total == merges[-1]["n_tokens"]
    _ref, ref_toks = _ref_train(CORPUS, 6)
    got = {
        r["doc_id"]: list(r["tokens"]) for r in encoded.collect()
    }
    for i, seq in enumerate(ref_toks):
        assert got[i] == seq


def test_vocabulary_ids(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=3)
    vocab = vocabulary(docs, merges).collect()
    base = [r for r in vocab if r["merge_rank"] == -1]
    learned = [r for r in vocab if r["merge_rank"] >= 0]
    assert len(learned) == 3
    assert [r["token"] for r in learned] == [
        m["a"] + m["b"] for m in merges
    ]
    # base charset ids are dense and ordered
    assert [r["token_id"] for r in base] == list(range(len(base)))
    assert sorted(r["token"] for r in base) == [
        r["token"] for r in base
    ]


def test_n_merges_validation(spark):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(_docs(spark), n_merges=0)


def test_empty_text_tokenizes_empty(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "ab")], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=1)
    rows = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize(df, merges).collect()}
    assert rows[0] == []
    assert rows[1] == ["ab"]


# ---------------------------------------------------------------------------
# review-pass regressions


def test_null_text_rows_survive_training(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "abab")], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=1)
    assert merges[0]["a"] == "a" and merges[0]["b"] == "b"
    rows = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize(df, merges).collect()}
    assert rows[0] == []
    assert rows[1] == ["ab", "ab"]


def test_tokenize_accepts_sparse_merge_table(spark):
    df = spark.createDataFrame([(0, "aaab")], "doc_id long, text string")
    # a filtered/reordered table: ranks are NOT dense positions
    merges = [{"rank": 7, "a": "a", "b": "a"}]
    rows = bpe_tokenize(df, merges).collect()
    assert list(rows[0]["tokens"]) == ["aa", "a", "b"]


def test_vocabulary_deduplicates_colliding_merge_strings(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    merges = [
        {"rank": 0, "a": "a", "b": "b"},
        {"rank": 1, "a": "ab", "b": "c"},
        {"rank": 2, "a": "a", "b": "bc"},  # same string 'abc'
    ]
    vocab = vocabulary(df, merges).collect()
    tokens = [r["token"] for r in vocab]
    assert len(tokens) == len(set(tokens))
    ids = sorted(r["token_id"] for r in vocab)
    assert ids == list(range(len(ids)))  # dense after the skip


# --- word-histogram trainer (train_bpe_hist) -------------------------------


def _ref_train_words(texts: list[str], n_merges: int):
    """Scalar word-scope reference: merges within words, counts
    weighted by word frequency — the histogram-path semantics."""
    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    words = [(list(w), c) for w, c in freq.items()]
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for seq, c in words:
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = (
                    counts.get((seq[i], seq[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        out = []
        for seq, c in words:
            res, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(seq[i])
                    i += 1
            out.append((res, c))
        words = out
        merges.append(
            {
                "rank": rank, "a": a, "b": b, "count": n,
                "n_tokens": sum(len(s) * c for s, c in words),
            }
        )
    return merges


def test_hist_matches_scalar_word_reference(spark):
    from physicsnemo_curator_spark.operators.bpe import train_bpe_hist

    got = train_bpe_hist(_docs(spark), n_merges=8)
    assert got == _ref_train_words(CORPUS, 8)


def test_hist_exactly_equals_corpus_path_on_single_word_docs(spark):
    """On one-word documents, doc scope == word scope: the histogram
    trainer must match train_bpe merge-for-merge (the parity pin the
    r09 verdict asked for — same argmax, tie-break, merge kernel)."""
    from physicsnemo_curator_spark.operators.bpe import train_bpe_hist

    words = [w for t in CORPUS for w in t.split()]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    assert train_bpe_hist(df, n_merges=8) == train_bpe(df, n_merges=8)


def test_word_frequency_table(spark):
    from physicsnemo_curator_spark.operators.bpe import word_frequency_table

    freq = {
        r["word"]: r["count"]
        for r in word_frequency_table(_docs(spark)).collect()
    }
    assert freq["low"] == 4 and freq["new"] == 3 and freq["lowest"] == 1


def test_hist_accepts_precomputed_histogram(spark):
    from physicsnemo_curator_spark.operators.bpe import (
        train_bpe_hist,
        word_frequency_table,
    )

    wf = word_frequency_table(_docs(spark))
    assert train_bpe_hist(word_freq=wf, n_merges=4) == train_bpe_hist(
        _docs(spark), n_merges=4
    )


def test_hist_null_and_empty_text(spark):
    from physicsnemo_curator_spark.operators.bpe import train_bpe_hist

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "ab ab")], "doc_id long, text string"
    )
    merges = train_bpe_hist(df, n_merges=1)
    assert merges == [
        {"rank": 0, "a": "a", "b": "b", "count": 2, "n_tokens": 2}
    ]
