"""DagPipeline example: phases declare DEPENDENCIES instead of list
position, and the engine resolves them (topological order, cycle and
sink validation) — the dependency-resolution half of the orchestrator.

The diamond here is the common reporting shape:

    clean ──► lang_totals ─┐
      │                    ▼
      └────────────► enrich (joins the totals back onto the rows)

``enrich`` lists ``["clean", "lang_totals"]``: the first dependency's
checkpointed output is its main input, the second arrives as a named
extra source for its join step.  Every phase still checkpoints through
the standard Pipeline path (events, error policies, empty-result
termination all apply).

Run:  python examples/dag_pipeline.py [sf_dir] [working_dir]
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phaser_spark import DagPipeline, Phase, dataframe_step, filter_rows
from phaser_spark.session import get_spark

spark = get_spark(app_name="dag_pipeline_example")


@dataframe_step(check_size=False)
def totals_per_lang(df, context=None):
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("lang_docs"),
        F.sum("n_chars").alias("lang_chars"),
    )


@dataframe_step(check_size=False, extra_sources=["lang_totals"])
def join_totals(df, context=None, **kw):
    return df.join(F.broadcast(kw["lang_totals"]), "lang")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/phaser_dag_example"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    dag = DagPipeline(
        phases={
            "clean": Phase(
                name="clean",
                steps=[filter_rows(F.col("n_chars") >= 30, name="min_length")],
            ),
            "lang_totals": (
                Phase(name="lang_totals", steps=[totals_per_lang], renumber=True),
                ["clean"],
            ),
            "enrich": (Phase(name="enrich", steps=[join_totals]), ["clean", "lang_totals"]),
        },
        working_dir=wd,
        spark=spark,
    )
    out = dag.run(docs)
    print("execution order:", dag._dag_order)
    print(f"{docs.count()} docs in -> {out.count()} enriched rows out")
    out.select("doc_id", "lang", "lang_docs", "lang_chars").show(5)


if __name__ == "__main__":
    main()
