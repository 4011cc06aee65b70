"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata (engine addition; BASELINE.json north star).

The Spark-side machinery — schema conventions, Arrow-batched decode UDFs,
partition-sized batch processing — is real and tested; the *codec* step is
stubbed (this environment ships no image/audio libraries).  Each stub is
deterministic so pipelines are testable end-to-end, and raises
``NotImplementedError`` when a real decode is requested without the
optional dependency.

Schema convention:

    content   binary                      -- the raw bytes
    meta      struct<kind string, mime string, width int, height int,
                     duration_ms long>    -- typed, filterable metadata

Partitioning note: binary payloads dominate row size; keep
``spark.sql.files.maxPartitionBytes`` at its default 128 MB and let the
scan split on row groups — never ``collect`` content columns.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

try:  # optional real decoder
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_binary(df: DataFrame, text_col: str, kind: str = "image") -> DataFrame:
    """Testing helper: wrap a text column as a binary payload + metadata
    (stands in for reading real media files at the same schema)."""
    content = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(content) % 1024).cast("int").alias("width"),
        (F.length(content) % 768).cast("int").alias("height"),
        F.length(content).cast("long").alias("duration_ms"),
    )
    return df.withColumn("content", content).withColumn("meta", meta)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: bytes of repeated sha256."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.sha256(seed).digest()
    while len(out) < dim:
        out.extend(b / 255.0 for b in h)
        h = hashlib.sha256(h).digest()
    return out[:dim]


def decode_and_featurize(
    df: DataFrame,
    content_col: str = "content",
    real_decode: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode binary payloads and extract a feature vector per row via
    ``mapInPandas`` (Arrow batches; bytes never leave the executor).

    ``real_decode=True`` requires an image library (absent here →
    ``NotImplementedError``); the default path produces deterministic fake
    features so the distributed plumbing is exercised end-to-end."""
    if real_decode and not _HAS_PIL:
        raise NotImplementedError(
            "real_decode=True needs an image codec (PIL); not available in "
            "this environment — the Spark plumbing below is the supported path"
        )
    # NOTE: no spread here — fanning out a small input spawns one Python
    # worker per partition, and worker startup dwarfs the decode work at
    # test scale; real media corpora arrive already split.
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("content_sha256", T.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            payloads = pdf[content_col]
            pdf = pdf.assign(
                features=[_fake_features(p) for p in payloads],
                content_sha256=[
                    hashlib.sha256(p or b"").hexdigest() for p in payloads
                ],
            )
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    every_ms: int = 1000,
) -> DataFrame:
    """Explode a (fake) video payload into frame rows — one row per sampled
    timestamp, preserving the parent id columns.  The sampling grid comes
    from metadata (``duration_ms``); the frame payload is a deterministic
    slice marker (a real codec would produce decoded frames)."""
    if every_ms < 1:
        raise ValueError(f"frame_sample needs every_ms >= 1, got {every_ms}")
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
        ),
        lambda i: F.struct(
            (i * every_ms).cast("long").alias("ts_ms"),
            F.sha2(F.concat(F.col(content_col), i.cast("string").cast("binary")), 256).alias(
                "frame_id"
            ),
        ),
    )
    return df.withColumn("frame", F.explode(frames)).select(
        "*", F.col("frame.ts_ms").alias("frame_ts_ms"), F.col("frame.frame_id").alias("frame_id")
    ).drop("frame")


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-level resize (real pixel work requires a codec): rewrites
    the meta struct; content passes through untouched."""
    meta = F.struct(
        F.col("meta.kind").alias("kind"),
        F.col("meta.mime").alias("mime"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return df.withColumn("meta", meta)
