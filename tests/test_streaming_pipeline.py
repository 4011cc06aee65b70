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


def test_normalize_event_time_three_fixture_shapes(spark, tmp_path):
    # The driver has shipped events.parquet as TIMESTAMP(NANOS)-as-bigint,
    # TIMESTAMP_MICROS/NTZ, and plain TIMESTAMP across rounds; the engine
    # helper must produce identical instants from all three encodings.
    from phaser_spark.io import normalize_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00.123456"), (2, "2024-03-01 10:05:30.000001")],
        "id long, raw string",
    )
    ltz = base.select("id", F.col("raw").cast("timestamp").alias("ts"))
    ntz = base.select("id", F.col("raw").cast("timestamp_ntz").alias("ts"))
    nanos = ltz.select(
        "id", (F.unix_micros("ts") * F.lit(1000)).cast("long").alias("ts")
    )

    expected = sorted((r.id, str(r.ts)) for r in ltz.collect())
    for shaped in (ltz, ntz, nanos):
        out = normalize_event_time(shaped, "ts")
        assert dict(out.dtypes)["ts"] == "timestamp"
        assert sorted((r.id, str(r.ts)) for r in out.collect()) == expected


def test_normalize_event_time_units_and_errors(spark):
    from phaser_spark.io import normalize_event_time
    from phaser_spark.exceptions import DataException

    import pytest

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(1, 1709287200)], "id long, ts long")
    out = normalize_event_time(df, "ts", long_unit="seconds")
    assert str(out.first().ts) == "2024-03-01 10:00:00"
    with pytest.raises(DataException):
        normalize_event_time(df, "missing")
    with pytest.raises(DataException):
        normalize_event_time(df, "ts", long_unit="fortnights")
    bad = spark.createDataFrame([(1, [1.0])], "id long, ts array<double>")
    with pytest.raises(DataException):
        normalize_event_time(bad, "ts")


def test_run_stream_ntz_source_watermarked(spark, tmp_path):
    # An NTZ-typed parquet streaming source must flow through a watermarked
    # phase pipeline: run_stream normalizes the event-time column to
    # TIMESTAMP before applying the watermark (withWatermark rejects NTZ).
    import glob
    import shutil

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    raw = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", 5.0), (2, "2024-03-01 10:01:00", 0.5),
         (3, "2024-03-01 10:02:00", 7.0)],
        "id long, raw string, score double",
    ).select("id", F.col("raw").cast("timestamp_ntz").alias("ts"), "score")
    stage = os.path.join(str(tmp_path), "stage")
    raw.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, "b1.parquet"))
    assert dict(spark.read.parquet(src_dir).dtypes)["ts"] == "timestamp_ntz"

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(raw.schema).parquet(src_dir)
    pipe.run_stream(
        stream,
        out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        event_time="ts",
        watermark_delay="10 minutes",
    )
    got = spark.read.parquet(out_dir)
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_run_stream_watermark_requires_event_time(spark, tmp_path):
    import pytest

    from phaser_spark.exceptions import PhaserError

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    schema = "id long, score double"
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(src_dir)
    with pytest.raises(PhaserError):
        pipe.run_stream(stream, os.path.join(str(tmp_path), "out"),
                        watermark_delay="10 minutes")


def test_normalize_event_time_value_sweep(spark):
    # broad instant sweep through all three physical shapes in one pass:
    # epoch, pre-1970, leap day, year/DST boundaries, microsecond extremes,
    # plus a pseudo-random spread across 1900-2100
    import datetime as dt

    from phaser_spark.io import normalize_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    edge = [
        "1970-01-01 00:00:00.000000",
        "1969-12-31 23:59:59.999999",   # pre-epoch (negative micros)
        "1900-06-15 12:30:45.000001",
        "2000-02-29 23:59:59.500000",   # leap day
        "2024-12-31 23:59:59.999999",
        "2025-03-30 02:30:00.000000",   # CET DST gap hour (UTC session: no-op)
        "2100-01-01 00:00:00.123456",
    ]
    rnd = [
        (dt.datetime(1970, 1, 1) + dt.timedelta(seconds=((i * 2654435761) % 4102444800) - 1000000000,
                                                microseconds=(i * 40503) % 1000000)
         ).strftime("%Y-%m-%d %H:%M:%S.%f")
        for i in range(200)
    ]
    vals = edge + rnd
    base = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, raw string")
    ltz = base.select("id", F.col("raw").cast("timestamp").alias("ts"))
    ntz = base.select("id", F.col("raw").cast("timestamp_ntz").alias("ts"))
    nanos = ltz.select("id", (F.unix_micros("ts") * F.lit(1000)).cast("long").alias("ts"))
    expected = sorted((r.id, str(r.ts)) for r in ltz.collect())
    for shaped in (ntz, nanos):
        got = sorted((r.id, str(r.ts)) for r in normalize_event_time(shaped, "ts").collect())
        assert got == expected


def _stage_file(spark, tmp_path, src_dir, df, name):
    import glob
    import shutil

    stage = os.path.join(str(tmp_path), f"stage_{name}")
    df.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, f"{name}.parquet"))


def test_run_stream_stateful_dedup_under_rocksdb(spark, tmp_path):
    # A watermarked dropDuplicates (keyed state) upstream of the phase
    # pipeline, with state_store="rocksdb": keyed state lives in RocksDB
    # (local disk), not executor heap — the 100 TB keyed-state setting.
    # The query's progress metrics prove the provider actually engaged.
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", 5.0), (1, "2024-03-01 10:00:30", 6.0),
         (2, "2024-03-01 10:01:00", 7.0), (3, "2024-03-01 10:02:00", 0.5)],
        "id long, raw string, score double",
    ).select("id", F.col("raw").cast("timestamp").alias("ts"), "score")
    _stage_file(spark, tmp_path, src_dir, raw, "b1")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = (
        spark.readStream.schema(raw.schema).parquet(src_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["id"])
    )
    q = pipe.run_stream(
        stream, out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        state_store="rocksdb",
    )
    got = spark.read.parquet(out_dir)
    # dedup kept one row per id; the phase then dropped id=3 (score 0.5)
    assert sorted(r.id for r in got.collect()) == [1, 2]
    prog = q.lastProgress
    assert prog and prog["stateOperators"], "stateful operator must report progress"
    metrics = prog["stateOperators"][0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in metrics), metrics
    # session conf restored after the run
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        is None
    )


def test_run_stream_event_time_unit_millis(spark, tmp_path):
    # A bigint event-time column holding epoch MILLIS must not be read as
    # nanos (that collapses instants to ~1970 and the watermark then drops
    # every row): event_time_unit plumbs through to normalize_event_time.
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base_ms = 1709287200000  # 2024-03-01 10:00:00 UTC
    raw = spark.createDataFrame(
        [(1, base_ms, 5.0), (2, base_ms + 60_000, 7.0)],
        "id long, ts long, score double",
    )
    _stage_file(spark, tmp_path, src_dir, raw, "b1")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(raw.schema).parquet(src_dir)
    pipe.run_stream(
        stream, out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        event_time="ts",
        watermark_delay="10 minutes",
        event_time_unit="millis",
    )
    got = spark.read.parquet(out_dir)
    assert dict(got.dtypes)["ts"] == "timestamp"
    stamps = sorted(str(r.ts) for r in got.collect())
    assert stamps == ["2024-03-01 10:00:00", "2024-03-01 10:01:00"]


def test_run_stream_warns_on_non_utc_session_for_ntz(spark, tmp_path):
    # NTZ wall-clock values are cast through the session timezone; a
    # non-UTC session silently shifts instants — run_stream must say so.
    import warnings

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    raw = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", 5.0)], "id long, raw string, score double"
    ).select("id", F.col("raw").cast("timestamp_ntz").alias("ts"), "score")
    _stage_file(spark, tmp_path, src_dir, raw, "b1")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        pipe = Pipeline(phases=[Clean], spark=spark)
        stream = spark.readStream.schema(raw.schema).parquet(src_dir)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pipe.run_stream(
                stream, os.path.join(str(tmp_path), "out"),
                checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
                event_time="ts",
                watermark_delay="10 minutes",
            )
        assert any("not UTC" in str(w.message) for w in caught)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_run_stream_continuous_soak_with_restart(spark, tmp_path):
    # Continuous mode (available_now=False) across >=3 micro-batches with
    # files arriving BETWEEN triggers and a restart after batch 2:
    # row numbers stay globally unique, no batch's rows are duplicated
    # (each batch overwrites only its own __phaser_batch_id__ partition),
    # and per-batch events keep flushing to events_path after the restart.
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    schema = "id long, score double"
    out_dir = os.path.join(str(tmp_path), "out")
    ev_dir = os.path.join(str(tmp_path), "events")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    def mk_stream():
        return (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    # run 1: two files arriving between triggers -> batches 0 and 1
    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(1, 5.0), (2, 6.0)], schema), "b1")
    pipe1 = Pipeline(phases=[Clean], spark=spark)
    q1 = pipe1.run_stream(mk_stream(), out_dir, checkpoint_dir=ckpt,
                          events_path=ev_dir, available_now=False)
    try:
        q1.processAllAvailable()
        _stage_file(spark, tmp_path, src_dir,
                    spark.createDataFrame([(3, 7.0), (4, 0.2)], schema), "b2")
        q1.processAllAvailable()
    finally:
        q1.stop()

    # restart with FRESH driver state; third file arrives before the run
    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(5, 9.0), (6, 8.0)], schema), "b3")
    pipe2 = Pipeline(phases=[Clean], spark=spark)
    q2 = pipe2.run_stream(mk_stream(), out_dir, checkpoint_dir=ckpt,
                          events_path=ev_dir, available_now=False)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(out_dir)
    rows = got.collect()
    # exactly-once: every surviving input row appears exactly once (id=4
    # dropped by the phase filter)
    assert sorted(r.id for r in rows) == [1, 2, 3, 5, 6]
    nums = [r[PHASER_ROW_NUM] for r in rows]
    assert len(nums) == len(set(nums)), f"duplicate row numbers: {sorted(nums)}"
    # numbering continued across the restart (batch 3 rows > batch 1-2 max)
    by_batch = {r["__phaser_batch_id__"]: [] for r in rows}
    for r in rows:
        by_batch[r["__phaser_batch_id__"]].append(r[PHASER_ROW_NUM])
    assert len(by_batch) == 3  # three distinct micro-batch partitions
    b_sorted = sorted(by_batch)
    assert min(by_batch[b_sorted[2]]) > max(by_batch[b_sorted[1]])
    # events flushed per batch, including after the restart (b2's drop)
    evs = spark.read.parquet(ev_dir)
    assert evs.filter(F.col("message").contains("filter_rows")).count() >= 1
    assert len({r["__phaser_batch_id__"] for r in evs.select("__phaser_batch_id__").collect()}) >= 1


def test_stream_output_compaction_then_resume(spark, tmp_path):
    # compaction between runs must not disturb exactly-once or numbering:
    # the resumed stream reads the same max row number from the compacted
    # table and continues without duplicates
    import glob

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    schema = "id long, score double"
    out_dir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    def mk_stream():
        return (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(i, float(i)) for i in range(1, 5)], schema), "b1")
    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(i, float(i)) for i in range(5, 9)], schema), "b2")
    pipe = Pipeline(phases=[Clean], spark=spark)
    pipe.run_stream(mk_stream(), out_dir, checkpoint_dir=ckpt)

    n_before = len(glob.glob(os.path.join(out_dir, "*", "*.parquet")))
    stats = pipe.compact_stream_output(out_dir)
    assert stats["rows"] == 8 and stats["files_after"] <= n_before

    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(9, 9.0), (10, 10.0)], schema), "b3")
    pipe2 = Pipeline(phases=[Clean], spark=spark)
    pipe2.run_stream(mk_stream(), out_dir, checkpoint_dir=ckpt)

    got = spark.read.parquet(out_dir)
    assert sorted(r.id for r in got.collect()) == list(range(1, 11))
    nums = sorted(r[PHASER_ROW_NUM] for r in got.collect())
    assert nums == list(range(1, 11))  # numbering continued across compaction


def test_run_stream_rocksdb_changelog_checkpointing(spark, tmp_path):
    # changelog checkpointing uploads per-batch deltas instead of full
    # RocksDB snapshots — per-batch checkpoint cost O(batch), not O(state);
    # both confs must be pinned for the query and restored afterwards
    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", 5.0), (1, "2024-03-01 10:00:30", 6.0),
         (2, "2024-03-01 10:01:00", 7.0)],
        "id long, raw string, score double",
    ).select("id", F.col("raw").cast("timestamp").alias("ts"), "score")
    _stage_file(spark, tmp_path, src_dir, raw, "b1")

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]

    chg_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = (
        spark.readStream.schema(raw.schema).parquet(src_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["id"])
    )
    q = pipe.run_stream(
        stream, os.path.join(str(tmp_path), "out"),
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        state_store="rocksdb",
        state_store_confs={chg_key: "true"},
    )
    got = spark.read.parquet(os.path.join(str(tmp_path), "out"))
    assert sorted(r.id for r in got.collect()) == [1, 2]
    metrics = q.lastProgress["stateOperators"][0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in metrics)
    # both pinned confs restored to unset
    assert spark.conf.get(chg_key, None) is None
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        is None
    )


def test_interval_join_streams_matches_static_join(spark, tmp_path):
    """Watermarked stream-stream interval join (ops.streamjoin): clicks
    within [0, 30 min] after a same-user purchase.  Batch parity: the
    streaming result must equal the static join's, and the plan must be a
    stateful stream-stream join (bounded state), not a full buffer."""
    import uuid

    from phaser_spark.ops.streamjoin import interval_join_streams

    clicks = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:05:00"), (2, 10, "2024-01-01 00:40:00"),
         (3, 20, "2024-01-01 00:10:00"), (4, 30, "2024-01-01 00:10:00")],
        "click_id long, user long, click_ts string",
    ).withColumn("click_ts", F.to_timestamp("click_ts"))
    purchases = spark.createDataFrame(
        [(100, 10, "2024-01-01 00:00:00"),   # matches click 1 (5m), not 2 (40m)
         (200, 20, "2024-01-01 00:00:00"),   # matches click 3 (10m)
         (300, 40, "2024-01-01 00:00:00")],  # no clicks for user 40
        "purchase_id long, user long, p_ts string",
    ).withColumn("p_ts", F.to_timestamp("p_ts"))

    c_dir, p_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.coalesce(1).write.parquet(c_dir)
    purchases.coalesce(1).write.parquet(p_dir)

    cs = spark.readStream.schema(clicks.schema).parquet(c_dir)
    ps = spark.readStream.schema(purchases.schema).parquet(p_dir)
    joined = interval_join_streams(
        cs, ps, "click_ts", "p_ts", on=["user"],
        lower="0 seconds", upper="30 minutes", watermark="1 minute",
    )
    name = f"ij_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table(name).select("click_id", "purchase_id").collect()
    }
    static = {
        (r.click_id, r.purchase_id)
        for r in clicks.join(
            purchases,
            (clicks.user == purchases.user)
            & (clicks.click_ts >= purchases.p_ts)
            & (clicks.click_ts <= purchases.p_ts + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == static == {(1, 100), (3, 200)}


def test_interval_join_streams_rejects_bad_shapes(spark):
    import pytest as _pytest

    from phaser_spark.exceptions import PhaserError
    from phaser_spark.ops.streamjoin import interval_join_streams

    a = spark.createDataFrame([], "k long, ts timestamp, v long")
    b = spark.createDataFrame([], "k long, ts timestamp, w long")
    with _pytest.raises(PhaserError):          # same ts name both sides
        interval_join_streams(a, b, "ts", "ts", on=["k"])
    b2 = b.withColumnRenamed("ts", "ts2").withColumnRenamed("w", "v")
    with _pytest.raises(PhaserError):          # ambiguous non-key column v
        interval_join_streams(a, b2, "ts", "ts2", on=["k"])
    with _pytest.raises(PhaserError):          # unsupported how
        interval_join_streams(
            a, b.withColumnRenamed("ts", "ts2"), "ts", "ts2", on=["k"], how="full"
        )


def test_run_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    # dedup_within_watermark: duplicates inside the watermark horizon are
    # suppressed, AND a key arriving after its state's watermark expiry is
    # emitted AGAIN — the re-emission is the observable proof that the
    # watermark actually evicted the key's state (a plain
    # dropDuplicates(keys) would keep the key forever and suppress it).
    from datetime import datetime

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    out_dir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = "id long, k string, ts timestamp"

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return datetime(2024, 1, 1, minutes // 60, minutes % 60, 0)

    class Keep(Phase):
        name = "Keep"
        columns = []
        steps = []

    def mk_stream():
        return (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    pipe = Pipeline(phases=[Keep], spark=spark)
    # batch 1: A twice (in-batch dup) + B; watermark after = t0+1m - 10m
    _stage_file(
        spark, tmp_path, src_dir,
        spark.createDataFrame(
            [(1, "A", t0), (2, "A", at(1)), (3, "B", t0)], schema
        ),
        "b1",
    )
    q = pipe.run_stream(
        mk_stream(), out_dir, checkpoint_dir=ckpt, available_now=False,
        event_time="ts", watermark_delay="10 minutes",
        dedup_within_watermark=["k"],
    )
    try:
        q.processAllAvailable()
        # batch 2: A again at t0+2m (state live -> suppressed) + C at
        # t0+60m, which advances the watermark to t0+50m, past A's
        # expiry (~t0+12m) -> A's state is evicted at batch end
        _stage_file(
            spark, tmp_path, src_dir,
            spark.createDataFrame([(4, "A", at(2)), (5, "C", at(60))], schema),
            "b2",
        )
        q.processAllAvailable()
        # batch 3: A at t0+2h -> re-emitted, proving bounded state
        _stage_file(
            spark, tmp_path, src_dir,
            spark.createDataFrame([(6, "A", at(120))], schema),
            "b3",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, []).append(r)
    assert len(by_key["B"]) == 1 and len(by_key["C"]) == 1
    # A: exactly the batch-1 first occurrence and the batch-3 revival —
    # the in-batch (id=2) and in-watermark (id=4) duplicates suppressed
    assert sorted(r.id for r in by_key["A"]) == [1, 6]
    a_batches = {r["__phaser_batch_id__"] for r in by_key["A"]}
    assert len(a_batches) == 2


def test_run_stream_dedup_within_watermark_requires_watermark(spark, tmp_path):
    import pytest as _pytest

    from phaser_spark.exceptions import PhaserError

    class Keep(Phase):
        name = "Keep"
        columns = []
        steps = []

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    stream = (
        spark.readStream.schema("id long, k string, ts timestamp")
        .parquet(src_dir)
    )
    pipe = Pipeline(phases=[Keep], spark=spark)
    with _pytest.raises(PhaserError):
        pipe.run_stream(
            stream, os.path.join(str(tmp_path), "out"),
            dedup_within_watermark=["k"],
        )


def test_quality_gate_step_runs_per_micro_batch(spark, tmp_path):
    # a quality gate inside a phase evaluates on EACH micro-batch: a
    # healthy batch flows through, then a violating batch stops the query
    import glob
    import shutil

    import pytest

    from phaser_spark.ops import quality as Q

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    good = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, score double")
    bad = spark.createDataFrame([(3, -4.0)], "id long, score double")
    for i, d in enumerate([good, bad], 1):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        d.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src_dir, f"b{i}.parquet"))

    class Gated(Phase):
        name = "Gated"
        steps = [Q.quality_gate_step([Q.in_range("score", 0, 100)])]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Gated], spark=spark)
    stream = (
        spark.readStream.schema(good.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="in_range"):
        pipe.run_stream(
            stream, out_dir, checkpoint_dir=os.path.join(str(tmp_path), "ckpt")
        )
    # the healthy batch's rows landed before the gate tripped
    got = spark.read.parquet(out_dir)
    assert sorted(r.id for r in got.collect()) == [1, 2]


def _stage_files(spark, tmp_path, dfs):
    import glob
    import shutil

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir, exist_ok=True)
    for i, d in enumerate(dfs, 1):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        d.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src_dir, f"b{i}.parquet"))
    return src_dir


def test_run_stream_rejects_renumber_phase(spark, tmp_path):
    from phaser_spark.exceptions import PhaserError
    import pytest

    class P(Phase):
        name = "P"
        renumber = True

    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    src = _stage_files(spark, tmp_path, [df])
    pipe = Pipeline(phases=[P], spark=spark)
    stream = spark.readStream.schema(df.schema).parquet(src)
    with pytest.raises(PhaserError, match="renumber"):
        pipe.run_stream(stream, os.path.join(str(tmp_path), "out"))


def test_run_stream_aborts_on_collected_errors(spark, tmp_path):
    """Batch parity: a micro-batch whose phase collects ERROR events must
    fail the stream, not silently write the error rows forever."""
    import pytest

    df = spark.createDataFrame([(1, "xyz"), (2, "2.0")], "id long, score string")
    src = _stage_files(spark, tmp_path, [df])

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]  # "xyz" -> malformed-value ERROR

    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = spark.readStream.schema(df.schema).parquet(src)
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="[Ee]rror"):
        pipe.run_stream(
            stream,
            os.path.join(str(tmp_path), "out"),
            checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        )


def test_run_stream_tail_dropped_numbers_not_reused(spark, tmp_path):
    """A batch whose LAST rows are dropped must not hand their numbers to
    the next batch — drop events were recorded against those numbers."""
    df1 = spark.createDataFrame([(1, 5.0), (2, 0.5)], "id long, score double")
    df2 = spark.createDataFrame([(3, 7.0)], "id long, score double")
    src = _stage_files(spark, tmp_path, [df1, df2])

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    out_dir = os.path.join(str(tmp_path), "out")
    ev_dir = os.path.join(str(tmp_path), "events")
    pipe = Pipeline(phases=[Clean], spark=spark)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pipe.run_stream(
        stream,
        out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        events_path=ev_dir,
    )
    out_nums = {r["id"]: r[PHASER_ROW_NUM] for r in spark.read.parquet(out_dir).collect()}
    # batch 1 numbers rows 1 (live) and 2 (dropped); batch 2 must start at
    # 3 — the old visible-max rule handed the dropped row's number 2 to
    # the next batch's first row
    assert out_nums == {1: 1, 3: 3}
    evs = spark.read.parquet(ev_dir).filter(F.col("type") == "DROPPED_ROW").collect()
    assert len(evs) == 1 and "1 rows dropped" in evs[0]["message"]


def test_run_stream_multiphase_dropped_numbers_not_reused(spark, tmp_path):
    """A row dropped in an EARLIER phase is filtered out before later
    phases run, so a last-phase-only high-water mark would miss its
    number and hand it to the next batch (its DROPPED_ROW event and the
    restart probe still refer to it)."""
    df1 = spark.createDataFrame([(1, 5.0), (2, 0.5)], "id long, score double")
    df2 = spark.createDataFrame([(3, 7.0)], "id long, score double")
    src = _stage_files(spark, tmp_path, [df1, df2])

    class Clean(Phase):
        name = "Clean"
        columns = [FloatColumn("score")]
        steps = [filter_rows(F.col("score") >= 1.0)]

    class Keep(Phase):
        name = "Keep"
        columns = [FloatColumn("score")]
        steps = []

    out_dir = os.path.join(str(tmp_path), "out")
    ev_dir = os.path.join(str(tmp_path), "events")
    pipe = Pipeline(phases=[Clean, Keep], spark=spark)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pipe.run_stream(
        stream,
        out_dir,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        events_path=ev_dir,
    )
    out_nums = {r["id"]: r[PHASER_ROW_NUM] for r in spark.read.parquet(out_dir).collect()}
    # batch 1 numbers rows 1 (live) and 2 (dropped in phase 1 of 2);
    # batch 2 must start at 3 even though Keep's output never saw row 2
    assert out_nums == {1: 1, 3: 3}


def test_drift_monitor_step_runs_per_micro_batch(spark, tmp_path):
    """The drift alarm evaluates each micro-batch against the tuning-time
    reference: an in-distribution batch flows, a hard-shifted one stops
    the stream; the reference histogram is computed once at construction
    (no per-batch reference rescans)."""
    import pytest

    from phaser_spark.ops.quality import drift_monitor_step

    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], "id long, score double"
    )
    ok = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(200)], "id long, score double"
    )
    bad = spark.createDataFrame(
        [(10_000 + i, 1e6) for i in range(100)], "id long, score double"
    )
    src_dir = _stage_files(spark, tmp_path, [ok, bad])

    class Monitored(Phase):
        name = "Monitored"
        steps = [drift_monitor_step(ref, "score", bins=10, fail_above=0.25)]

    out_dir = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(phases=[Monitored], spark=spark)
    stream = (
        spark.readStream.schema(ok.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="fail_above"):
        pipe.run_stream(
            stream, out_dir, checkpoint_dir=os.path.join(str(tmp_path), "ckpt")
        )
    # the in-distribution batch's rows landed before the alarm tripped
    got = spark.read.parquet(out_dir)
    assert got.count() == 200


import pytest


@pytest.mark.oracle
def test_run_stream_survives_process_kill(spark, tmp_path):
    # HARD restart: the first run happens in a SEPARATE python process
    # that is SIGKILLed after its first micro-batch lands — no graceful
    # q.stop(), no checkpoint finalization, driver state gone with the
    # process.  The resume (fresh process state, same checkpoint +
    # output table) must continue row-number lineage monotonically and
    # keep exactly-once output.  Oracle tier: boots a second JVM (~30 s).
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    src_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(src_dir)
    schema = "id long, score double"
    out_dir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(1, 5.0), (2, 6.0)], schema), "b1")

    child_src = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
        from phaser_spark import FloatColumn, Phase, Pipeline
        from phaser_spark.session import get_spark

        spark = get_spark(app_name="kill_me", master="local[4]",
                          shuffle_partitions=4)
        stream = (spark.readStream
                  .schema("id long, score double")
                  .option("maxFilesPerTrigger", 1)
                  .parquet({repr(src_dir)}))
        pipe = Pipeline(phases=[Phase(name="Clean",
                                      columns=[FloatColumn("score")])],
                        spark=spark)
        q = pipe.run_stream(stream, {repr(out_dir)},
                            checkpoint_dir={repr(ckpt)},
                            available_now=False)
        print("STREAM_STARTED", flush=True)
        q.awaitTermination()
    """)
    script = os.path.join(str(tmp_path), "child.py")
    with open(script, "w") as f:
        f.write(child_src)
    proc = subprocess.Popen([sys.executable, script],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        # wait for batch 1 to land in the output table, then KILL -9
        deadline = time.time() + 180
        seen = 0
        while time.time() < deadline:
            try:
                seen = spark.read.parquet(out_dir).count()
            except Exception:
                seen = 0
            if seen >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError("child stream process died before batch 1")
            time.sleep(1)
        assert seen >= 2, "child never produced batch 1 within 180s"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
        proc.wait()

    # resume from the killed run's checkpoint with a new input file
    _stage_file(spark, tmp_path, src_dir,
                spark.createDataFrame([(3, 7.0), (4, 8.0)], schema), "b2")
    pipe2 = Pipeline(
        phases=[Phase(name="Clean", columns=[FloatColumn("score")])],
        spark=spark,
    )
    stream2 = (spark.readStream
               .schema(spark.createDataFrame([], schema).schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(src_dir))
    pipe2.run_stream(stream2, out_dir, checkpoint_dir=ckpt)

    got = spark.read.parquet(out_dir).collect()
    assert sorted(r.id for r in got) == [1, 2, 3, 4]  # exactly-once
    nums = sorted(r[PHASER_ROW_NUM] for r in got)
    assert nums == [1, 2, 3, 4]  # lineage continued monotonically
    by_id = {r.id: r[PHASER_ROW_NUM] for r in got}
    assert max(by_id[1], by_id[2]) < min(by_id[3], by_id[4])
