"""Beyond-reference operators for large-scale training-data pipelines.

The reference (lisad/phaser) is a row-oriented ETL framework with no
dedup/similarity/text operators; these modules add the operations a
100 TB training-data pipeline needs (BASELINE.json "north_star"),
expressed Spark-first: built-in expressions where possible, Arrow-batched
pandas UDFs only where semantics demand Python.
"""

from . import (  # noqa: F401
    behavior,
    bloom,
    bpe,
    cdc,
    cleaning,
    dedup,
    dsir,
    embeddings,
    features,
    frequency,
    graph,
    multimodal,
    phash,
    pii,
    pq,
    profile,
    quality,
    relational,
    sampling,
    scd,
    similarity,
    spatial,
    sketches,
    streamjoin,
    text,
    timeseries,
    web,
)
