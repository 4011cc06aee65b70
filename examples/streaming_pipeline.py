"""Streaming phase pipeline over the events table (engine addition; the
reference framework is strictly batch).

The SAME declarative Phase — column contracts, filter steps, error
policies, lineage row numbers — runs over a file stream via
``Pipeline.run_stream``.  Demonstrates the production wrinkles the engine
absorbs:

* the source stores event time as ``TIMESTAMP_MICROS isAdjustedToUTC=0``
  (Spark reads it as ``TIMESTAMP_NTZ``, which ``withWatermark`` rejects)
  — ``event_time="ts"`` normalizes it to LTZ before the watermark;
* row numbers continue across micro-batches (max+1), and a restart from
  the checkpoint resumes numbering from the output table, not driver
  memory;
* each batch overwrites its own ``__phaser_batch_id__`` partition, so
  micro-batch retries replace rather than duplicate.

Run:  python examples/streaming_pipeline.py [sf_dir] [out_dir]
"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phaser_spark import FloatColumn, Phase, Pipeline, filter_rows
from phaser_spark.session import get_spark

# column expressions in the class body are built at class-definition time,
# which needs an active SparkContext (same pattern as the training example)
spark = get_spark(app_name="streaming_pipeline_example")


class CleanEvents(Phase):
    name = "CleanEvents"
    columns = [FloatColumn("value", min_value=0.0)]
    steps = [filter_rows(F.col("event_type") != "error", name="drop_errors")]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="phaser_stream_ex_")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # file-stream sources must be directories: stage the single events
    # parquet into one (a real deployment points at a landing directory
    # that upstream writers append to)
    src_dir = os.path.join(out_root, "landing")
    os.makedirs(src_dir, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    if not glob.glob(os.path.join(src_dir, "*.parquet")):
        shutil.copy(src, os.path.join(src_dir, "events.parquet"))
    schema = spark.read.parquet(src).schema

    pipe = Pipeline(phases=[CleanEvents], spark=spark)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out_dir = os.path.join(out_root, "out")
    pipe.run_stream(
        stream,
        out_dir,
        checkpoint_dir=os.path.join(out_root, "ckpt"),
        event_time="ts",
        watermark_delay="10 minutes",
    )

    got = spark.read.parquet(out_dir)
    n = got.count()
    print(f"{n} events survived the streaming contract -> {out_dir}")
    print(f"ts dtype after normalization: {dict(got.dtypes)['ts']}")
    got.select("event_id", "ts", "event_type", "value").orderBy("event_id").show(5)


if __name__ == "__main__":
    main()
