"""Reshape parity: pivot (locations), explode (languages), renumber
(reference tests/test_reshape.py shapes, SURVEY §2.5/§2.8)."""
from pyspark.sql import functions as F

from phaser_spark import Phase
from phaser_spark.constants import PHASER_ROW_NUM
from phaser_spark.context import Context
from phaser_spark.ops import relational


def test_pivot_long_to_wide_renumbered(spark):
    rows = [
        ("Ten Forward", "temperature", "21"),
        ("Ten Forward", "gamma radiation", "9.8 μR/h"),
        ("Engineering", "temperature", "19"),
        ("Engineering", "gamma radiation", "10.1 μR/h"),
    ]
    df = spark.createDataFrame(rows, ["location", "measure", "value"])
    step = relational.pivot_step(
        ["location"], "measure", F.first("value"), values=["temperature", "gamma radiation"]
    )
    ph = Phase(name="P", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    got = {r["location"]: (r["temperature"], r["gamma radiation"]) for r in out.collect()}
    assert got["Ten Forward"] == ("21", "9.8 μR/h")
    assert got["Engineering"] == ("19", "10.1 μR/h")
    # renumbered from 1 (reference tests/test_reshape.py:22-64)
    assert sorted(r[PHASER_ROW_NUM] for r in out.collect()) == [1, 2]


def test_explode_multivalued_column(spark):
    rows = [(1, "Standard,Vulcan,Romulan"), (2, "Standard"), (3, "Standard,Klingon")]
    df = spark.createDataFrame(rows, ["crew_id", "languages"])
    step = relational.explode_step("languages", "language")
    ph = Phase(name="E", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    assert out.count() == 6
    langs = sorted(
        r["language"] for r in out.filter(F.col("crew_id") == 1).collect()
    )
    assert langs == ["Romulan", "Standard", "Vulcan"]


def test_explode_step_regex_metachar_delimiter(spark):
    # '|' and '.' are regex metachars — the delimiter must split on the
    # LITERAL character, not on every position
    rows = [(1, "a|b|c"), (2, "x")]
    df = spark.createDataFrame(rows, ["rid", "vals"])
    step = relational.explode_step("vals", "v", delimiter="|")
    ph = Phase(name="E2", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    got = sorted(r["v"] for r in out.filter(F.col("rid") == 1).collect())
    assert got == ["a", "b", "c"]
    df2 = spark.createDataFrame([(1, "a.b")], ["rid", "vals"])
    step2 = relational.explode_step("vals", "v", delimiter=".")
    ph2 = Phase(name="E3", steps=[step2], renumber=True, context=Context(spark=spark))
    assert sorted(r["v"] for r in ph2.run(df2).collect()) == ["a", "b"]


def test_agg_step_group_counts(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["pid", "x"])
    step = relational.agg_step(["pid"], [F.count(F.lit(1)).alias("n")])
    ph = Phase(name="A", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    got = {r["pid"]: r["n"] for r in out.collect()}
    assert got == {1: 2, 2: 1}


def test_join_step_broadcast_enrichment(spark):
    from phaser_spark import ExtraRecords

    facts = spark.createDataFrame([("a", 1), ("b", 2), ("zz", 3)], ["k", "v"])
    dim = spark.createDataFrame([("a", "Alpha"), ("b", "Beta")], ["k", "label"])
    ctx = Context(spark=spark)
    ctx.set_source(ExtraRecords("dim", dim))
    step = relational.join_step("dim", on="k", how="left", warn_on_miss=True)
    ph = Phase(name="J", steps=[step], extra_sources=["dim"], context=ctx)
    out = ph.run(facts)
    got = {r["k"]: r["label"] for r in out.collect()}
    assert got == {"a": "Alpha", "b": "Beta", "zz": None}
    assert any("no match" in e["message"] for e in ctx.driver_events)


def test_salted_join_matches_plain_join(spark):
    from phaser_spark.ops.relational import salted_join

    # Zipf-head skew: one key carries most rows
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(20)] + [(9, 1)],
        "k long, v long",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "unused")], "k long, name string")
    expected = sorted((r.k, r.v, r.name) for r in big.join(small, ["k"], "inner").collect())
    got = sorted((r.k, r.v, r.name) for r in salted_join(big, small, ["k"], n_salts=8).collect())
    assert got == expected and len(got) == 520

    # left join: unmatched key 9 survives exactly once with null name
    exp_left = sorted(
        (r.k, r.v, r.name) for r in big.join(small, ["k"], "left").collect()
    )
    got_left = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(big, small, ["k"], n_salts=8, how="left").collect()
    )
    assert got_left == exp_left and len(got_left) == 521


def test_salted_join_spreads_hot_key_over_salts(spark):
    from phaser_spark.ops.relational import salted_join

    # the hot key's rows must land on multiple distinct salt values —
    # that's the whole point (one shuffle partition no longer owns the key)
    big = spark.createDataFrame([(1, i) for i in range(200)], "k long, v long")
    small = spark.createDataFrame([(1, "hot")], "k long, name string")
    n = (
        big.withColumn("s", F.pmod(F.xxhash64("v"), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n == 8  # all salt buckets used for the hot key
    assert salted_join(big, small, ["k"], n_salts=8).count() == 200


def test_multilevel_agg_rollup_matches_union_of_groupbys(spark):
    from phaser_spark.ops.relational import multilevel_agg

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", None, 4)],
        "c1 string, c2 string, n int",
    )
    got = {
        tuple(r)
        for r in multilevel_agg(
            df, ["c1", "c2"], [F.sum("n").alias("s")], kind="rollup"
        ).collect()
    }
    # union-of-groupbys reference: (c1,c2) gid=0, (c1) gid=1, () gid=3
    lvl0 = [(r.c1, r.c2, 0, r.s) for r in df.groupBy("c1", "c2").agg(F.sum("n").alias("s")).collect()]
    lvl1 = [(r.c1, None, 1, r.s) for r in df.groupBy("c1").agg(F.sum("n").alias("s")).collect()]
    lvl2 = [(None, None, 3, r.s) for r in df.agg(F.sum("n").alias("s")).collect()]
    assert got == set(lvl0 + lvl1 + lvl2)
    # the natural NULL group value stays distinguishable from the subtotal
    assert ("b", None, 0, 4) in got and ("b", None, 1, 7) in got


def test_multilevel_agg_cube_and_sets(spark):
    from phaser_spark.ops.relational import multilevel_agg

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "c1 string, c2 string, n int"
    )
    cube = multilevel_agg(df, ["c1", "c2"], [F.sum("n").alias("s")], kind="cube")
    assert cube.count() == 8  # 3 + 2 + 2 + 1
    sets = multilevel_agg(
        df, ["c1", "c2"], [F.sum("n").alias("s")], kind="sets",
        sets=[["c1"], ["c2"], []],
    )
    got = {(r.c1, r.c2, r.grouping_id): r.s for r in sets.collect()}
    assert got == {
        ("a", None, 1): 3, ("b", None, 1): 3,
        (None, "x", 2): 4, (None, "y", 2): 2,
        (None, None, 3): 6,
    }


def test_multilevel_agg_pre_aggs_matches_single_phase(spark):
    # Two-phase (pre-aggregated) rollup/cube must be row-identical to the
    # one-phase form for decomposable aggregates — the contract
    # relational.multilevel_agg's ``pre_aggs`` docstring promises.
    from pyspark.sql import types as T

    from phaser_spark.ops.relational import multilevel_agg

    df = spark.createDataFrame(
        [("a", "x", 1.5), ("a", "y", 2.25), ("b", "x", 3.125), ("b", None, 4.0),
         ("a", "x", 0.625), ("b", "x", 7.75)],
        "c1 string, c2 string, v double",
    )
    for kind in ("rollup", "cube"):
        one = {
            tuple(r)
            for r in multilevel_agg(
                df,
                ["c1", "c2"],
                [
                    F.round(F.sum(F.col("v").cast(T.DecimalType(28, 8))), 2)
                    .cast("double")
                    .alias("s"),
                    F.count(F.lit(1)).alias("n"),
                ],
                kind=kind,
            ).collect()
        }
        two = {
            tuple(r)
            for r in multilevel_agg(
                df,
                ["c1", "c2"],
                [
                    F.round(F.sum("__ps"), 2).cast("double").alias("s"),
                    F.sum("__pn").alias("n"),
                ],
                kind=kind,
                pre_aggs=[
                    F.sum(F.col("v").cast(T.DecimalType(28, 8))).alias("__ps"),
                    F.count(F.lit(1)).alias("__pn"),
                ],
            ).collect()
        }
        assert one == two, kind


def _naive_range_join(points, intervals, keys=()):
    cond = (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))
    j = points.crossJoin(intervals) if not keys else points.join(intervals, list(keys))
    return sorted(tuple(r) for r in j.filter(cond).select("pid", "iid").collect())


def test_range_join_matches_naive_across_bin_widths(spark):
    from phaser_spark.ops.relational import range_join

    # boundary points: p == s matches, p == e does not; intervals spanning
    # 0, 1, and many bins; negative values exercise floor-division binning
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([-7, -1, 0, 1, 3.5, 5, 9.99, 10, 42])],
        "pid long, p double",
    )
    intervals = spark.createDataFrame(
        [(0, -10.0, -6.0), (1, -2.0, 2.0), (2, 0.0, 10.0), (3, 5.0, 5.0),
         (4, 3.5, 45.0), (5, 9.99, 10.0)],
        "iid long, s double, e double",
    )
    expected = _naive_range_join(points, intervals)
    assert expected  # non-degenerate fixture
    for w in (0.5, 1.0, 4.0, 100.0):
        got = sorted(
            tuple(r)
            for r in range_join(
                points, intervals, "p", "s", "e", bin_width=w
            ).select("pid", "iid").collect()
        )
        assert got == expected, f"bin_width={w}"
    # unbinned fallback agrees too
    got = sorted(
        tuple(r)
        for r in range_join(points, intervals, "p", "s", "e")
        .select("pid", "iid").collect()
    )
    assert got == expected


def test_range_join_with_equi_keys_and_timestamps(spark):
    from phaser_spark.ops.relational import range_join

    points = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:05:00"), (2, 10, "2024-01-01 02:00:00"),
         (3, 20, "2024-01-01 00:05:00")],
        "pid long, user long, p string",
    ).withColumn("p", F.to_timestamp("p"))
    intervals = spark.createDataFrame(
        [(100, 10, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         (200, 20, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "iid long, user long, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    got = sorted(
        tuple(r)
        for r in range_join(
            points, intervals, "p", "s", "e", on=["user"], bin_width=1800.0
        ).select("pid", "iid").collect()
    )
    # user 10's 00:05 point matches its interval; 02:00 is outside; user 20
    # matches only its own interval (the equi key separates users)
    assert got == [(1, 100), (3, 200)]


def test_rollup_step_in_phase_with_expression_columns(spark):
    """rollup_step as a phase step, with an EXPRESSION grouping column
    (aliased date_trunc) — the column-ordering logic must resolve aliases,
    and the phase renumbers the multi-level output."""
    from phaser_spark import Phase
    from phaser_spark.context import Context
    from phaser_spark.ops.relational import rollup_step

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "a", 1.0), ("2024-01-01 11:00:00", "a", 2.0),
         ("2024-01-02 09:00:00", "b", 3.0)],
        "ts string, kind string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    step = rollup_step(
        [F.date_trunc("day", F.col("ts")).alias("day"), "kind"],
        [F.sum("v").alias("total")],
    )
    ph = Phase(name="R", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    assert set(out.columns) >= {"day", "kind", "grouping_id", "total"}
    rows = {(str(r.day), r.kind, r.grouping_id): r.total for r in out.collect()}
    assert rows[("2024-01-01 00:00:00", "a", 0)] == 3.0
    assert rows[("2024-01-01 00:00:00", None, 1)] == 3.0
    assert rows[("2024-01-02 00:00:00", None, 1)] == 3.0
    assert rows[(str(None), None, 3)] == 6.0 or rows.get((None, None, 3)) == 6.0
    # row numbers renumbered from 1
    from phaser_spark.constants import PHASER_ROW_NUM
    nums = sorted(r[PHASER_ROW_NUM] for r in out.collect())
    assert nums == list(range(1, len(rows) + 1))


def test_unpivot_intersect_except_steps(spark):
    from phaser_spark.ops.relational import except_step, intersect_step, unpivot_step

    df = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0)], "id long, a double, b double"
    )
    step = unpivot_step(["id"], ["a", "b"], "metric", "val")
    ph = Phase(name="U", steps=[step], renumber=True, context=Context(spark=spark))
    out = ph.run(df)
    got = {(r.id, r.metric): r.val for r in out.collect()}
    assert got == {(1, "a"): 10.0, (1, "b"): 100.0, (2, "a"): 20.0, (2, "b"): 200.0}

    from phaser_spark import ExtraRecords

    left = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y"), (3, "z")], "k long, v string")
    right = spark.createDataFrame([(2, "y"), (3, "z"), (4, "w")], "k long, v string")
    ctx = Context(spark=spark)
    ctx.set_source(ExtraRecords("other", right))
    inter = Phase(
        name="I", steps=[intersect_step("other")], renumber=True, context=ctx,
        extra_sources=["other"],
    ).run(left)
    assert sorted((r.k, r.v) for r in inter.collect()) == [(2, "y"), (3, "z")]
    ctx2 = Context(spark=spark)
    ctx2.set_source(ExtraRecords("other", right))
    exc = Phase(
        name="X", steps=[except_step("other", all_rows=True)], renumber=True,
        context=ctx2, extra_sources=["other"],
    ).run(left)
    assert sorted((r.k, r.v) for r in exc.collect()) == [(1, "x"), (2, "y")]


def test_running_sum_step_two_level_matches_global_window(spark):
    """The bucketed running sum equals the naive global ordered window —
    including NULL semantics (NULL until the first non-null value,
    null-only buckets forward the prior prefix) — with every sort task
    bounded by bucket_rows, and its plan free of unpartitioned row-level
    windows."""
    from pyspark.sql import Window

    from phaser_spark.lineage import with_row_numbers
    from phaser_spark.plan import plan_text

    rows = [(i, None if i % 7 == 3 else i * 10) for i in range(1, 401)]
    # leading all-null run: rows 1..12 null — the running value must stay
    # NULL across the first bucket boundary (bucket_rows=8 below)
    rows = [(i, None) if i <= 12 else (i, v) for i, v in rows]
    df = with_row_numbers(
        spark.createDataFrame(rows, "id long, v long").orderBy("id")
    )
    step = relational.running_sum_step("v", "run", bucket_rows=8)
    ph = Phase(name="RS", steps=[step], context=Context(spark=spark))
    out = ph.run(df)
    got = {r["id"]: r["run"] for r in out.collect()}
    w = Window.orderBy(PHASER_ROW_NUM).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["run"]
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want
    # leading nulls stayed NULL, later values are real sums
    assert got[1] is None and got[12] is None and got[13] == 130
    # plan shape: no row-level window without a partition spec — the only
    # unpartitioned windowspec allowed is the coarse per-bucket prefix
    # (operates on n_rows/bucket_rows aggregate rows, not data rows)
    inner = relational.running_sum_step("v", "run", bucket_rows=8)(df)
    plan = plan_text(inner)
    for line in plan.splitlines():
        if "windowspecdefinition" in line and PHASER_ROW_NUM in line:
            assert "__rs_bucket__" in line, f"global row-level window: {line}"
