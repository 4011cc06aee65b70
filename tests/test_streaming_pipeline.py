"""Streaming pipelines (engine addition): the same declarative Phase
pipeline over a readStream source via Pipeline.run_stream — batch parity
for results, cross-batch row-number continuity."""
import os

from pyspark.sql import functions as F

from phaser_spark import FloatColumn, Phase, Pipeline, filter_rows
from phaser_spark.constants import PHASER_ROW_NUM


def test_run_stream_matches_batch(spark, tmp_path):
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    df1 = spark.createDataFrame([(1, 5.0), (2, 0.5), (3, 7.0)], "id long, score double")
    df2 = spark.createDataFrame([(4, 9.0), (5, 0.1)], "id long, score double")
    import glob
    import shutil

    for i, d in enumerate([df1, df2], 1):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        d.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src_dir, f"b{i}.parquet"))

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    pipe.run_stream(stream, out_dir, checkpoint_dir=os.path.join(str(tmp_path), "ckpt"))

    got = spark.read.parquet(out_dir)
    assert sorted(r.id for r in got.collect()) == [1, 3, 4]
    # row numbers unique and contiguous-per-batch (max+1 continuation)
    nums = sorted(r[PHASER_ROW_NUM] for r in got.collect())
    assert len(set(nums)) == 3 and nums[0] >= 1 and nums[-1] <= 5


def test_run_stream_flushes_events_to_events_path(spark, tmp_path):
    # continuous-mode memory bound: with events_path given, row-level drop
    # events land in a per-batch parquet table instead of accumulating on
    # the driver context
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    import glob
    import shutil

    df1 = spark.createDataFrame([(1, 5.0), (2, 0.5), (3, 7.0)], "id long, score double")
    stage = os.path.join(str(tmp_path), "stage")
    df1.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, "b1.parquet"))

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    out_dir = os.path.join(str(tmp_path), "out")
    ev_dir = os.path.join(str(tmp_path), "events")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(df1.schema).parquet(src_dir)
    pipe.run_stream(
        stream, out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        events_path=ev_dir,
    )
    evs = spark.read.parquet(ev_dir)
    msgs = [r.message for r in evs.collect()]
    assert any("rows dropped by filter_rows" in m for m in msgs)
    # nothing retained on the driver context in events_path mode
    assert pipe.context.event_dfs == []


def test_run_stream_restart_continues_numbering(spark, tmp_path):
    # restart-from-checkpoint with a FRESH Pipeline (driver state gone):
    # the second run must derive its numbering start from the output table,
    # not replay or duplicate the first run's rows
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)

    import glob
    import shutil

    def add_file(df, name):
        stage = os.path.join(str(tmp_path), f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src_dir, f"{name}.parquet"))

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    schema = "id long, score double"
    out_dir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    add_file(spark.createDataFrame([(1, 5.0), (2, 6.0)], schema), "b1")
    pipe1 = Pipeline(phases=[Clean], spark=spark)
    stream1 = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src_dir)
    pipe1.run_stream(stream1, out_dir, checkpoint_dir=ckpt)

    add_file(spark.createDataFrame([(3, 7.0), (4, 8.0)], schema), "b2")
    pipe2 = Pipeline(phases=[Clean], spark=spark)  # fresh driver state
    stream2 = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(src_dir)
    pipe2.run_stream(stream2, out_dir, checkpoint_dir=ckpt)

    got = spark.read.parquet(out_dir).collect()
    assert sorted(r.id for r in got) == [1, 2, 3, 4]  # no replay duplicates
    nums = sorted(r[PHASER_ROW_NUM] for r in got)
    assert nums == [1, 2, 3, 4]  # second run continued from max+1
