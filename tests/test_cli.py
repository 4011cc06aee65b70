"""CLI surface (SURVEY.md §2.10 C1-C3): run, diff, describe end-to-end."""
import os
import sys

import pytest

from phaser_spark.cli.main import main

PIPELINE_MOD = """
from pyspark.sql import functions as F
from phaser_spark import Column, FloatColumn, Phase, Pipeline, filter_rows


class Clean(Phase):
    name = "Clean"
    columns = [Column("name", fix_value_fn="strip"), FloatColumn("score")]
    steps = [filter_rows(F.col("score") >= 1.0)]


class DemoPipeline(Pipeline):
    phases = [Clean]
"""

CSV = "name,score\\n alice ,2.5\\nbob,0.5\\ncara,3.0\\n"


@pytest.fixture()
def workdir(tmp_path, monkeypatch, spark):
    pkg = tmp_path / "pipelines"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "demo.py").write_text(PIPELINE_MOD)
    (tmp_path / "src.csv").write_text(CSV.replace("\\n", "\n"))
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("pipelines", None)
    sys.modules.pop("pipelines.demo", None)
    return tmp_path


def test_cli_run_and_diff_and_describe(workdir, capsys):
    wd = str(workdir / "out")
    rc = main(["run", "demo", wd, str(workdir / "src.csv")])
    assert rc == 0
    out_files = os.listdir(wd)
    assert any(f.startswith("Clean_output") for f in out_files)
    assert "errors_and_warnings.txt" in out_files
    content = open(os.path.join(wd, "Clean_output.csv")).read()
    assert "alice" in content and "bob" not in content  # filtered + stripped

    rc = main(["diff", "demo", wd])
    assert rc == 0
    assert any(f.endswith(".html") for f in os.listdir(wd))

    rc = main(["describe", "demo"])
    assert rc == 0
    desc = capsys.readouterr().out
    assert "Clean" in desc and "filter_rows" in desc

    # reference parity: debug is declared but unimplemented, exits 0
    rc = main(["debug", "demo"])
    assert rc == 0
    assert "not yet implemented" in capsys.readouterr().out


def test_cli_compact(spark, tmp_path, capsys):
    import os

    from phaser_spark.cli.main import main

    path = os.path.join(str(tmp_path), "frag")
    spark.range(0, 500).repartition(12).write.parquet(path)
    rc = main(["compact", path, "--partition-col", ""])
    assert rc == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "500 rows" in out
    assert spark.read.parquet(path).count() == 500


def test_cli_profile(spark, tmp_path, capsys):
    import os

    from phaser_spark.cli.main import main

    path = os.path.join(str(tmp_path), "t.parquet")
    spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, s string"
    ).write.parquet(path)
    rc = main(["profile", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_rows" in out and "n_distinct" in out
    rc = main(["profile", path, "--columns", "s", "--approx-distinct"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "id" not in out.split() and "null_ratio" in out


PARQUET_PIPELINE_MOD = """
from pyspark.sql import functions as F
from phaser_spark import Column, FloatColumn, Phase, Pipeline, filter_rows
from phaser_spark import DagPipeline  # imported subclass: must NOT count


class Clean(Phase):
    name = "Clean"
    columns = [Column("name", fix_value_fn="strip"), FloatColumn("score")]
    steps = [filter_rows(F.col("score") >= 1.0)]


class ParquetPipeline(Pipeline):
    phases = [Clean]
    save_format = "parquet"
"""


def test_cli_diff_parquet_pipeline_with_imported_subclass(workdir, capsys, spark):
    """Regression: (a) an imported Pipeline subclass (DagPipeline) used to
    make discovery fail with 'found 2'; (b) diff crashed on parquet
    pipelines because source_copy.parquet has no row numbers."""
    (workdir / "pipelines" / "pq.py").write_text(PARQUET_PIPELINE_MOD)
    sys.modules.pop("pipelines.pq", None)
    wd = str(workdir / "outpq")
    assert main(["run", "pq", wd, str(workdir / "src.csv")]) == 0
    assert main(["diff", "pq", wd]) == 0
    assert any(f.endswith(".html") for f in os.listdir(wd))
    # columnar source_copy keeps ingest row numbers: a multi-file parquet
    # scan orders splits by size, so a diff-time re-number would scramble
    # the join keys (CSV/JSON copies are single-file and stay number-free)
    from phaser_spark.constants import PHASER_ROW_NUM

    copy = spark.read.parquet(os.path.join(wd, "source_copy.parquet"))
    assert PHASER_ROW_NUM in copy.columns
    assert {r[PHASER_ROW_NUM] for r in copy.collect()} == {1, 2, 3}


RENUMBER_PIPELINE_MOD = """
from pyspark.sql import functions as F
from phaser_spark import Column, FloatColumn, Phase, Pipeline, filter_rows


class Clean(Phase):
    name = "Clean"
    columns = [Column("name", fix_value_fn="strip"), FloatColumn("score")]
    steps = [filter_rows(F.col("score") >= 1.0)]
    renumber = True


class RenumPipeline(Pipeline):
    phases = [Clean]
"""


def test_cli_diff_skips_renumber_phase(workdir, capsys):
    """Reference diff.py:103-117 via Phase.diffable() (phase.py:330-331):
    a renumber=True phase rewrites row identity, so the diff CLI must
    SKIP it (an indexed diff would mark every row changed) and say so."""
    (workdir / "pipelines" / "renum.py").write_text(RENUMBER_PIPELINE_MOD)
    sys.modules.pop("pipelines.renum", None)
    wd = str(workdir / "outrn")
    assert main(["run", "renum", wd, str(workdir / "src.csv")]) == 0
    assert main(["diff", "renum", wd]) == 0
    out = capsys.readouterr().out
    assert "Skipping diff" in out and "may reorganize data" in out
    assert not any(f.startswith("diff_") for f in os.listdir(wd))


def test_cli_discovers_reexported_pipeline_class(workdir):
    """A pipelines module that IMPORTS its single Pipeline subclass from
    another module (re-export layout) must still be discovered; the
    in-module filter only breaks ties against engine imports."""
    (workdir / "defs.py").write_text(PIPELINE_MOD)
    (workdir / "pipelines" / "reex.py").write_text(
        "from phaser_spark import DagPipeline  # engine import: never a candidate\n"
        "from defs import DemoPipeline\n"
    )
    sys.modules.pop("defs", None)
    sys.modules.pop("pipelines.reex", None)
    from phaser_spark.cli.main import _find_pipeline_class

    assert _find_pipeline_class("reex").__name__ == "DemoPipeline"


def test_table_diff_string_row_numbers_sort_numerically(spark):
    """CSV checkpoints read back all-string: rn must order 2 before 10."""
    from phaser_spark.constants import PHASER_ROW_NUM
    from phaser_spark.table_diff import IndexedTableDiffer

    a = spark.createDataFrame(
        [(str(i), "old") for i in range(1, 12)], f"{PHASER_ROW_NUM} string, v string"
    )
    b = spark.createDataFrame(
        [(str(i), "new") for i in range(1, 12)], f"{PHASER_ROW_NUM} string, v string"
    )
    d = IndexedTableDiffer(a, b, render_limit=3)
    nums = [r["row_num"] for r in d.rows()]
    assert nums == [1, 2, 3]  # lexicographic would give [1, 10, 11]


def test_cli_describe_json(workdir, capsys):
    import json

    rc = main(["describe", "demo", "--json"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["pipeline"] == "DemoPipeline"
    ph = doc["phases"][0]
    assert ph["name"] == "Clean"
    assert {c["name"] for c in ph["columns"]} == {"name", "score"}
    assert any("filter" in s for s in ph["steps"])
    # the USAGE.md contract: these keys are stable (additions-only, never
    # renamed) — CI consumers parse them with .get() and ignore unknowns
    documented = {
        "name", "renumber", "error_policy", "columns", "steps",
        "extra_sources", "extra_outputs", "checkpoint_bucket_by",
        "checkpoint_sort_by", "checkpoint_partition_by",
    }
    assert documented <= set(ph), sorted(documented - set(ph))
    assert isinstance(ph["renumber"], bool)
    assert all({"name", "type"} <= set(c) for c in ph["columns"])
