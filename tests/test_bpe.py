"""Tests for distributed BPE training/tokenization (ops/bpe.py)."""
import re

import pytest
from pyspark.sql import functions as F

from phaser_spark.exceptions import PhaserError
from phaser_spark.ops import bpe


def _ref_train(word_freqs: dict[str, int], num_merges: int, min_count: int):
    """Independent reference BPE trainer (dict-of-tuples formulation)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        # max count, ties lexicographic ascending on (left, right)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), cnt = best
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _norm_words(text):
    norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
    return [w for w in norm.split(" ") if w]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats eat the rats"),
        (3, "a rat in a hat and a cat in a mat"),
        (4, "low lower lowest slower slowest"),
        (5, "the the the cat cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_matches_reference(spark, corpus):
    freqs = {}
    for r in corpus.collect():
        for w in _norm_words(r["text"]):
            freqs[w] = freqs.get(w, 0) + 1
    expect = _ref_train(freqs, num_merges=12, min_count=2)
    got = bpe.bpe_train(corpus, "doc_id", "text", num_merges=12, min_pair_count=2)
    assert got == expect
    # merges are real multi-round compositions, not just char pairs
    assert any(len(a) + len(b) > 2 for a, b, _ in got)


def test_greedy_merge_overlap_rule(spark):
    # 'aaa' x3 with pair (a,a): greedy left-to-right gives [aa, a] — the
    # wrapped-replace must NOT over-merge, and the count of (a,a) in
    # 'aaa' is 2 (overlapping occurrences both counted)
    df = spark.createDataFrame([(1, "aaa aaa aaa")], "doc_id long, text string")
    merges = bpe.bpe_train(df, "doc_id", "text", num_merges=2, min_pair_count=1)
    assert merges[0][:2] == ("a", "a")
    assert merges[0][2] == 6  # 2 overlapping pairs x 3 occurrences
    # second round: symbols are [aa, a] per word -> pair (aa, a) count 3
    assert merges[1] == ("aa", "a", 3)


def test_tokenize_consistent_with_training(spark, corpus):
    merges = bpe.bpe_train(corpus, "doc_id", "text", num_merges=10, min_pair_count=2)
    out = bpe.bpe_tokenize(corpus, "doc_id", "text", merges)
    rows = {r["doc_id"]: r for r in out.collect()}
    # reconstruct: tokens concatenated == normalized text without spaces
    for r in corpus.collect():
        toks = rows[r["doc_id"]]["tokens"]
        assert "".join(toks) == "".join(_norm_words(r["text"]))
        assert rows[r["doc_id"]]["n_tokens"] == len(toks)
    # lowest-rank-first inference reproduces the trained segmentation of
    # a word seen in training: replay training merges on 'the'
    freqs = {}
    for r in corpus.collect():
        for w in _norm_words(r["text"]):
            freqs[w] = freqs.get(w, 0) + 1
    ref = _ref_train(freqs, 10, 2)
    # apply reference merges to 'lowest' step by step
    syms = list("lowest")
    for a, b, _ in ref:
        out2, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out2.append(a + b)
                i += 2
            else:
                out2.append(syms[i])
                i += 1
        syms = out2
    got_low = bpe._merge_word("lowest", {(m[0], m[1]): i for i, m in enumerate(merges)})
    assert got_low == syms


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    _word = st.text(alphabet="abc", min_size=1, max_size=12)

    @settings(max_examples=80, deadline=None)
    @given(
        train_words=st.lists(_word, min_size=1, max_size=8),
        query_word=_word,
        num_merges=st.integers(min_value=1, max_value=10),
    )
    def test_rank_first_inference_equals_merge_replay_fuzz(
        train_words, query_word, num_merges
    ):
        """Property pinning the oracle-equivalence claim: lowest-rank-first
        inference == replaying training merges in order, for ARBITRARY
        words (seen or unseen) under ANY trained merge table.  (This is
        the standard BPE theorem — a later merge can never create an
        opportunity for an earlier one, because the merged symbol did
        not exist when the earlier merge was ranked.)"""
        freqs = {}
        for w in train_words:
            freqs[w] = freqs.get(w, 0) + 1
        merges = _ref_train(freqs, num_merges, min_count=1)
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        # replay in training order (greedy left-to-right per merge)
        syms = list(query_word)
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert bpe._merge_word(query_word, ranks) == syms


def test_merges_df_shape(spark, corpus):
    mdf = bpe.bpe_merges_df(corpus, "doc_id", "text", num_merges=5, min_pair_count=2)
    rows = mdf.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["pair_count"] >= 2 for r in rows)


def test_train_rejects_bad_params(spark, corpus):
    with pytest.raises(PhaserError):
        bpe.bpe_train(corpus, "doc_id", "text", num_merges=0)
    with pytest.raises(PhaserError):
        bpe.bpe_train(corpus, "doc_id", "text", min_pair_count=0)