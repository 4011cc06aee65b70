"""Tests for perceptual-hash media dedup (ops/phash.py)."""
import hashlib

import pytest
from pyspark.sql import functions as F

from phaser_spark.exceptions import PhaserError
from phaser_spark.ops import phash


def _ref_fake_grid(payload: bytes):
    """Python replay of the Catalyst md5-chain grid."""
    base = hashlib.md5(payload).hexdigest()
    return [
        int(hashlib.md5(f"{base}-{i}".encode()).hexdigest()[:2], 16)
        for i in range(phash.GRID_ROWS * phash.GRID_COLS)
    ]


def _ref_dhash(grid):
    h = 0
    for k in range(phash.N_BITS):
        r, c = divmod(k, phash.GRID_COLS - 1)
        if grid[r * phash.GRID_COLS + c] < grid[r * phash.GRID_COLS + c + 1]:
            h |= 1 << k
    return h


def test_fake_grid_and_dhash_match_python_replay(spark):
    rows = [(1, b"payload-one"), (2, b"payload-two"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r["phash"]
        for r in phash.media_phash(df, "media_id", "content").collect()
    }
    assert out[1] == _ref_dhash(_ref_fake_grid(b"payload-one"))
    assert out[2] == _ref_dhash(_ref_fake_grid(b"payload-two"))
    assert out[3] is None
    assert 0 <= out[1] < (1 << 63)


def test_hamming_pairs_pigeonhole_recall(spark):
    """Flipping <= 3 bits must always be found (4-chunk guarantee);
    a 4-bit spread across all four chunks must NOT pair at radius 3
    (and would defeat the blocking even if the radius allowed it)."""
    base = _ref_dhash(_ref_fake_grid(b"x"))
    rows = [
        (1, base),
        (2, base ^ (1 << 5)),                      # 1 bit
        (3, base ^ (1 << 0) ^ (1 << 17) ^ (1 << 34)),  # 3 bits, 3 chunks
        (4, base ^ (1 << 1) ^ (1 << 18) ^ (1 << 35) ^ (1 << 52)),  # 4 bits, all chunks
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, h long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash.hamming_dup_pairs(df, "media_id", "h").collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 3
    assert (1, 4) not in pairs
    assert all(5 not in p for p in pairs)
    # 2 vs 3 differ in 4 bits -> absent; 2 vs 4 differ in 5 -> absent
    assert (2, 3) not in pairs and (2, 4) not in pairs


def test_phash_dedup_pairs_end_to_end(spark):
    # identical payloads -> identical hash -> hamming 0 pair
    rows = [(1, b"same-bytes"), (2, b"same-bytes"), (3, b"different")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = phash.phash_dedup_pairs(df, "media_id", "content").collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_hamming_rejects_large_radius(spark):
    df = spark.createDataFrame([(1, 7)], "media_id long, h long")
    with pytest.raises(PhaserError):
        phash.hamming_dup_pairs(df, "media_id", "h", max_hamming=4)


def test_real_decode_gate(spark):
    from phaser_spark.ops.multimodal import _HAS_PIL

    df = spark.createDataFrame([(1, b"x")], "media_id long, content binary")
    if not _HAS_PIL:
        with pytest.raises(NotImplementedError):
            phash.media_phash(df, "media_id", "content", real_decode=True)
    else:  # pragma: no cover - codec-ful environments
        out = phash.media_phash(df, "media_id", "content", real_decode=True).collect()
        assert out[0]["phash"] is None  # b"x" is not a decodable image