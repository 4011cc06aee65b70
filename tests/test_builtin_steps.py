"""Builtin-step parity tests (reference tests/test_builtin_steps.py shapes)."""
import pytest
from pyspark.sql import functions as F

from phaser_spark import (
    DataErrorException,
    Phase,
    check_unique,
    drop_duplicate_rows,
    filter_rows,
    flatten_all,
    flatten_column,
    sort_by,
)
from phaser_spark.constants import PHASER_ROW_NUM
from phaser_spark.context import Context
from phaser_spark.lineage import with_row_numbers


def run_steps(spark, steps, rows, header):
    df = spark.createDataFrame(rows, header)
    ph = Phase(name="T", steps=steps, context=Context(spark=spark))
    # user-visible phase output: dropped-marked rows stripped, exactly as
    # the Pipeline does at its checkpoint
    from phaser_spark.constants import DROP_COL

    return ph.run(df).filter(~F.col(DROP_COL))


def test_drop_duplicate_rows_keeps_last(spark):
    rows = [("a", "1"), ("b", "2"), ("a", "3")]
    out = run_steps(spark, [drop_duplicate_rows(columns=["k"])], rows, ["k", "v"])
    got = {r["k"]: (r["v"], r[PHASER_ROW_NUM]) for r in out.collect()}
    # last duplicate wins (phaser/builtin_steps.py:15-54)
    assert got["a"] == ("3", 3) and got["b"] == ("2", 2)


def test_drop_duplicate_rows_all_columns(spark):
    rows = [("a", "1"), ("a", "1"), ("b", "2")]
    out = run_steps(spark, [drop_duplicate_rows()], rows, ["k", "v"])
    assert out.count() == 2


def test_sort_by_nulls_first_stable(spark):
    rows = [("b",), (None,), ("a",), ("a",)]
    out = run_steps(spark, [sort_by("k")], rows, ["k"])
    got = [(r["k"], r[PHASER_ROW_NUM]) for r in out.collect()]
    assert got == [(None, 2), ("a", 3), ("a", 4), ("b", 1)]


def test_check_unique_passes(spark):
    out = run_steps(spark, [check_unique("k")], [("a",), ("b",)], ["k"])
    assert out.count() == 2


def test_check_unique_strip_and_case(spark):
    ph = Phase(
        name="T",
        steps=[check_unique("k", strip=True, ignore_case=True)],
        context=Context(spark=spark),
    )
    df = spark.createDataFrame([("a ",), ("A",)], ["k"])
    # under the default COLLECT policy the batch error is recorded as an
    # event; the *pipeline* raises at the checkpoint (phaser/pipeline.py:198-199)
    ph.run(df)
    assert ph.context.phase_has_errors("T")


def test_check_unique_missing_column(spark):
    ph = Phase(name="T", steps=[check_unique("zzz")], context=Context(spark=spark))
    df = spark.createDataFrame([("a",)], ["k"])
    ph.run(df)
    assert ph.context.phase_has_errors("T")


def test_filter_rows_expression(spark):
    ctx = Context(spark=spark)
    ph = Phase(name="T", steps=[filter_rows(F.col("k") != "x")], context=ctx)
    out = ph.run(spark.createDataFrame([("x",), ("y",)], ["k"]))
    from phaser_spark.constants import DROP_COL

    assert [r["k"] for r in out.filter(~F.col(DROP_COL)).collect()] == ["y"]
    evs = [e for e in ctx.driver_events if e["type"] == "DROPPED_ROW"]
    assert len(evs) == 1 and "1 rows dropped" in evs[0]["message"]


def test_filter_rows_python_predicate(spark):
    ctx = Context(spark=spark)
    ph = Phase(name="T", steps=[filter_rows(lambda row: row["k"] == "y")], context=ctx)
    out = ph.run(spark.createDataFrame([("x",), ("y",)], ["k"]))
    from phaser_spark.constants import DROP_COL

    assert [r["k"] for r in out.filter(~F.col(DROP_COL)).collect()] == ["y"]


def test_drop_count_resolves_from_checkpoint_not_rescan(spark):
    # when the pipeline has materialized a checkpoint, the summarized drop
    # count must come from it — the fallback (a re-execution of the step's
    # input plan) is a None sentinel here and would raise if touched
    from phaser_spark.builtin_steps import _defer_drop_count
    from phaser_spark.constants import DROP_STEP_COL

    ctx = Context(spark=spark)
    ctx.current_phase = "P"
    ckpt = spark.createDataFrame(
        [("a", "filter_rows"), ("b", None), ("c", "filter_rows")],
        f"k string, {DROP_STEP_COL} string",
    )
    ctx.phase_checkpoints["P"] = ckpt
    _defer_drop_count(
        ctx, "filter_rows", "{n} rows dropped by filter_rows",
        None, None,  # fallback sentinels: touching them would raise
    )
    evs = [e for e in ctx.driver_events if e["type"] == "DROPPED_ROW"]
    assert len(evs) == 1 and "2 rows dropped" in evs[0]["message"]


def test_flatten_column_deep(spark):
    df = spark.createDataFrame(
        [(123, {"type": {"oid": "1b2a", "name": "Reply"}, "content": "Hello"})],
        "id long, msg struct<type: struct<oid: string, name: string>, content: string>",
    )
    out = run_steps(spark, [flatten_column("msg", deep=True)], df.collect(), df.schema)
    assert {"msg__type__oid", "msg__type__name", "msg__content"} <= set(out.columns)
    r = out.collect()[0]
    assert r["msg__type__oid"] == "1b2a" and r["msg__content"] == "Hello"


def test_flatten_column_shallow(spark):
    df = spark.createDataFrame(
        [(1, {"type": {"oid": "x"}, "content": "c"})],
        "id long, msg struct<type: struct<oid: string>, content: string>",
    )
    out = run_steps(spark, [flatten_column("msg", deep=False)], df.collect(), df.schema)
    assert "msg__type" in out.columns and "msg__content" in out.columns


def test_flatten_all(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}, {"b": {"c": 2}})],
        "id long, x struct<a: long>, y struct<b: struct<c: long>>",
    )
    out = run_steps(spark, [flatten_all()], df.collect(), df.schema)
    assert {"x__a", "y__b__c"} <= set(out.columns)
