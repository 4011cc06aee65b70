"""Tests for cross-document substring dedup (ops/cdc.py).

The CDC boundary rule is pinned two ways: against a byte-at-a-time
pure-Python gear-hash reference (the vectorized sliding-window fold must
be bit-identical), and behaviorally — a span duplicated at a DIFFERENT
offset in another document must still produce identical chunk hashes
(the whole point of content-defined over aligned chunking).
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from phaser_spark.exceptions import PhaserError
from phaser_spark.ops import cdc


# --------------------------------------------------------------------------
# pure-python reference for the gear rule (independent formulation)
# --------------------------------------------------------------------------

def _ref_boundaries(data: bytes, mask: int, min_len: int, max_len: int):
    """Byte-at-a-time gear hash; mirrors the docstring rule, not the code."""
    n = len(data)
    spans, pos = [], 0
    while pos < n:
        lo, hi = pos + min_len, min(pos + max_len, n)
        if lo >= hi:
            spans.append((pos, n - pos))
            break
        cut = hi
        h = 0
        # h at position p folds the last 64 bytes; recompute per chunk from
        # scratch (h only has 64 bytes of memory, so warming from p-63 on)
        for p in range(max(0, pos + min_len - cdc._GEAR_WINDOW), hi):
            h = ((h << 1) + int(cdc._GEAR[data[p]])) % (1 << 64)
            if p + 1 >= pos + min_len and p + 1 >= cdc._GEAR_WINDOW and (h & mask) == 0:
                if pos + min_len <= p + 1 <= hi:
                    cut = p + 1
                    break
        spans.append((pos, cut - pos))
        pos = cut
    return spans


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gear_boundaries_match_reference(seed):
    rng = np.random.RandomState(seed)
    data = bytes(rng.randint(0, 256, size=2000, dtype=np.uint8))
    got = cdc._gear_boundaries_one(data, mask=63, min_len=16, max_len=256)
    ref = _ref_boundaries(data, mask=63, min_len=16, max_len=256)
    assert got == ref
    # spans tile the input exactly
    assert got[0][0] == 0
    assert sum(l for _, l in got) == len(data)
    for (s0, l0), (s1, _) in zip(got, got[1:]):
        assert s0 + l0 == s1


def test_gear_boundaries_degenerate_input():
    # one repeated byte: hash is constant, so either every position cuts
    # (min_len chunks) or none does (max_len chunks) — never unbounded
    spans = cdc._gear_boundaries_one(b"a" * 5000, mask=63, min_len=16, max_len=256)
    assert sum(l for _, l in spans) == 5000
    assert all(l <= 256 for _, l in spans)
    assert cdc._gear_boundaries_one(b"", mask=63, min_len=16, max_len=256) == []


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=4000),
        target_pow=st.integers(min_value=3, max_value=9),
        min_len=st.integers(min_value=1, max_value=64),
    )
    def test_gear_boundaries_fuzz_vs_reference(data, target_pow, min_len):
        """Property fuzz: vectorized fold == byte-at-a-time reference on
        arbitrary bytes and parameter shapes, and spans always tile."""
        mask = (1 << target_pow) - 1
        max_len = min_len * 4 + 7
        got = cdc._gear_boundaries_one(data, mask, min_len, max_len)
        ref = _ref_boundaries(data, mask, min_len, max_len)
        assert got == ref
        assert sum(l for _, l in got) == len(data)
        assert all(1 <= l <= max(max_len, min_len) for _, l in got) or not data


# --------------------------------------------------------------------------
# offset-shift invariance: the content-defined property itself
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def shifted_docs(spark):
    rng = np.random.RandomState(7)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)
    shared = bytes(alphabet[rng.randint(0, len(alphabet), 3000)]).decode()
    prefix_a = bytes(alphabet[rng.randint(0, len(alphabet), 911)]).decode()
    prefix_b = bytes(alphabet[rng.randint(0, len(alphabet), 257)]).decode()
    unique_c = bytes(alphabet[rng.randint(0, len(alphabet), 3000)]).decode()
    rows = [
        (1, prefix_a + shared),
        (2, prefix_b + shared),   # same span, different offset
        (3, unique_c),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_chunks_align_across_offsets(spark, shifted_docs):
    chunks = cdc.cdc_chunks(
        shifted_docs, "doc_id", "text", target_len=256
    ).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc"], set()).add((r["chunk_hash"], r["chunk_len"]))
    # interior chunks of the shared 3000-char span hash identically in
    # docs 1 and 2 despite the different prefixes
    common = by_doc[1] & by_doc[2]
    assert len(common) >= 3
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    assert 4 not in by_doc  # null text → no chunks
    # spans tile each doc: per-doc chunk lens sum to the byte length
    lens = {}
    for r in chunks:
        lens[r["doc"]] = lens.get(r["doc"], 0) + r["chunk_len"]
    for row in shifted_docs.where(F.col("text").isNotNull()).collect():
        assert lens[row["doc_id"]] == len(row["text"].encode())


def test_dup_report_flags_shifted_duplicate(spark, shifted_docs):
    rep = {
        r["doc"]: r
        for r in cdc.substring_dup_report(
            shifted_docs, "doc_id", "text", target_len=256
        ).collect()
    }
    # doc 1 wins every shared chunk (lowest doc id) → no dup chars there
    assert rep[1]["dup_chunks"] == 0
    # doc 2 loses the shared interior chunks
    assert rep[2]["dup_chunks"] >= 3
    assert 0.5 < rep[2]["dup_frac"] <= 1.0
    assert rep[3]["dup_chunks"] == 0 and rep[3]["dup_frac"] == 0.0
    assert rep[2]["total_chars"] == len(
        (
            shifted_docs.where("doc_id = 2").collect()[0]["text"]
        ).encode()
    )


def test_substring_scrub_removes_losers_only(spark, shifted_docs):
    out = {
        r["doc_id"]: r
        for r in cdc.substring_scrub(
            shifted_docs, "doc_id", "text", target_len=256
        ).collect()
    }
    orig = {r["doc_id"]: r["text"] for r in shifted_docs.collect()}
    # winner and unique docs unchanged
    assert out[1]["text"] == orig[1] and out[1]["scrubbed_chars"] == 0
    assert out[3]["text"] == orig[3] and out[3]["scrubbed_chars"] == 0
    # loser doc shrinks; what remains is a subsequence of the original
    # (kept spans concatenate in offset order)
    assert out[2]["scrubbed_chars"] > 1500
    assert len(out[2]["text"]) + out[2]["scrubbed_chars"] == len(orig[2])
    it = iter(orig[2])
    assert all(c in it for c in out[2]["text"])
    # null text stays null
    assert out[4]["text"] is None and out[4]["scrubbed_chars"] == 0


def test_scrub_then_report_is_clean(spark, shifted_docs):
    """Scrubbing is idempotent: a second report over the scrubbed corpus
    finds (almost) nothing — only boundary-resplit noise, and none here
    because kept spans are contiguous prefixes/suffixes."""
    scrubbed = cdc.substring_scrub(shifted_docs, "doc_id", "text", target_len=256)
    rep = cdc.substring_dup_report(
        scrubbed.select("doc_id", "text"), "doc_id", "text", target_len=256
    )
    assert rep.agg(F.sum("dup_chunks")).collect()[0][0] == 0


# --------------------------------------------------------------------------
# aligned mode (the SQL-oracle spine)
# --------------------------------------------------------------------------

def test_aligned_mode_matches_manual_blocks(spark):
    rows = [(1, "abcdefghij"), (2, "abcdeXYZ"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = cdc.cdc_chunks(df, "doc_id", "text", mode="aligned", target_len=5).collect()
    got = {(r["doc"], r["chunk_start"], r["chunk_len"]) for r in chunks}
    assert got == {(1, 0, 5), (1, 5, 5), (2, 0, 5), (2, 5, 3)}
    # identical first blocks hash identically
    h = {}
    for r in chunks:
        h.setdefault((r["chunk_start"], r["chunk_len"]), set()).add(r["chunk_hash"])
    assert len(h[(0, 5)]) == 1  # "abcde" in both docs


def test_aligned_dup_report_first_doc_wins(spark):
    rows = [(1, "AAAAABBBBB"), (2, "AAAAACCCCC"), (3, "AAAAABBBBB")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {
        r["doc"]: r
        for r in cdc.substring_dup_report(
            df, "doc_id", "text", mode="aligned", target_len=5
        ).collect()
    }
    assert (rep[1]["dup_chunks"], rep[2]["dup_chunks"], rep[3]["dup_chunks"]) == (0, 1, 2)
    assert rep[3]["dup_frac"] == 1.0


def test_cache_chunks_same_result_and_pins_table(spark, shifted_docs):
    base = sorted(
        tuple(r) for r in cdc.substring_dup_report(
            shifted_docs, "doc_id", "text", target_len=256
        ).collect()
    )
    try:
        pinned = sorted(
            tuple(r) for r in cdc.substring_dup_report(
                shifted_docs, "doc_id", "text", target_len=256, cache_chunks=True
            ).collect()
        )
        assert pinned == base
        assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() > 0
    finally:
        spark.catalog.clearCache()


def test_cdc_rejects_bad_params(spark, shifted_docs):
    with pytest.raises(PhaserError):
        cdc.cdc_chunks(shifted_docs, "doc_id", "text", target_len=100)  # not 2^k
    with pytest.raises(PhaserError):
        cdc.cdc_chunks(shifted_docs, "doc_id", "text", min_len=0)
    with pytest.raises(PhaserError):
        cdc.cdc_chunks(shifted_docs, "doc_id", "text", mode="suffix-array")
