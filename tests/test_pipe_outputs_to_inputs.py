"""Golden cross-phase piping test (J3): an aggregate built as an
ExtraMapping output in phase 1 is consumed as an extra source in phase 2 —
the reference's families.py sibling-count idiom
(tests/pipelines/families.py; docs 'Piping data between phases')."""
import os

from phaser_spark import ExtraMapping, Phase, Pipeline, row_step
from phaser_spark.constants import PHASER_ROW_NUM


def test_sibling_counts_pipe(spark, tmp_path):
    src = os.path.join(str(tmp_path), "kids.csv")
    with open(src, "w") as f:
        f.write("name,family\nAmy,Adams\nBen,Adams\nCara,Adams\nDan,Bell\nEve,Bell\nFay,Cole\n")

    @row_step(extra_outputs=["family_counts"])
    def count_family(row, family_counts):
        family_counts[row["family"]] += 1
        return row

    @row_step(extra_sources=["family_counts"], output_schema="siblings long")
    def add_siblings(row, family_counts):
        row["siblings"] = int(family_counts[row["family"]]) - 1
        return row

    counts_out = ExtraMapping("family_counts", {})

    class CountPhase(Phase):
        name = "CountPhase"
        steps = [count_family]
        extra_outputs = [counts_out]

    class EnrichPhase(Phase):
        name = "EnrichPhase"
        steps = [add_siblings]
        extra_sources = ["family_counts"]

    wd = os.path.join(str(tmp_path), "out")
    pipe = Pipeline(working_dir=wd, source=src, phases=[CountPhase, EnrichPhase], spark=spark)
    out = pipe.run()
    got = {r["name"]: r["siblings"] for r in out.collect()}
    assert got == {"Amy": 2, "Ben": 2, "Cara": 2, "Dan": 1, "Eve": 1, "Fay": 0}
    # row numbers survived both phases
    nums = sorted(r[PHASER_ROW_NUM] for r in out.select(PHASER_ROW_NUM).collect())
    assert nums == [1, 2, 3, 4, 5, 6]
    # the piped mapping was saved as an extra output file
    assert any(f.startswith("family_counts") for f in os.listdir(wd))
