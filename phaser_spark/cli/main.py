"""CLI: ``python -m phaser_spark run|diff|describe`` (reference
``phaser/cli/main.py:60-137``, SURVEY.md §2.10).

* ``run <pipeline> <working_dir> <source> [--error-policy P]
  [--<extra-source> path] [--master M] [--conf k=v]`` — discovers the sole
  Pipeline subclass in ``pipelines.<name>`` (or a ``module:Class`` path),
  instantiates it, runs it.  Unrecognized ``--name path`` pairs initialize
  extra sources (two-pass dynamic args, reference ``main.py:121-123``).
* ``diff <pipeline> <working_dir>`` — per-phase HTML diffs of consecutive
  checkpoints (reference ``cli/commands/diff.py``).
* ``describe <pipeline>`` — prints the phase/step/column plan (the
  reference declares this command but leaves it a stub; SURVEY.md C3).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

from ..exceptions import PhaserError


def _find_pipeline_class(name: str):
    from ..pipeline import Pipeline

    if ":" in name:
        mod_name, cls_name = name.split(":", 1)
        mod = importlib.import_module(mod_name)
        return getattr(mod, cls_name)
    mod = importlib.import_module(f"pipelines.{name}")
    subclasses = list(
        dict.fromkeys(
            v
            for v in vars(mod).values()
            if isinstance(v, type) and issubclass(v, Pipeline) and v is not Pipeline
        )
    )
    # prefer classes defined HERE: `from phaser_spark import DagPipeline`
    # must not count as a second candidate alongside the module's own class
    candidates = [
        v for v in subclasses if getattr(v, "__module__", None) == mod.__name__
    ]
    if not candidates:
        # re-export layout (`from myapp.defs import CleanPipeline`): fall
        # back to imported subclasses, still excluding the engine's own
        candidates = [
            v
            for v in subclasses
            if not getattr(v, "__module__", "").startswith("phaser_spark")
        ]
    if len(candidates) != 1:
        raise PhaserError(
            f"pipelines.{name} must define exactly one Pipeline subclass, "
            f"found {len(candidates)}"
        )
    return candidates[0]


def cmd_run(argv: list[str]) -> int:
    # allow_abbrev=False: with prefix matching, a dynamic extra-source
    # flag like --mast would be swallowed by --master and the source
    # silently never initialized
    parser = argparse.ArgumentParser(prog="phaser_spark run", allow_abbrev=False)
    parser.add_argument("pipeline")
    parser.add_argument("working_dir")
    parser.add_argument("source")
    parser.add_argument("--error-policy", default=None)
    parser.add_argument("--master", default=None)
    parser.add_argument("--conf", action="append", default=[])
    args, extra = parser.parse_known_args(argv)

    from ..session import get_spark

    for kv in args.conf:
        if "=" not in kv:
            parser.error(f"--conf expects key=value, got {kv!r}")
    conf = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(master=args.master, extra_conf=conf)
    cls = _find_pipeline_class(args.pipeline)
    pipe = cls(
        working_dir=args.working_dir,
        source=args.source,
        error_policy=args.error_policy,
        spark=spark,
    )
    # dynamic extra-source args: --name path OR --name=path
    # (reference main.py:121-123)
    it = iter(extra)
    for flag in it:
        if not flag.startswith("--"):
            parser.error(f"unexpected argument {flag}")
        if "=" in flag:
            flag, path = flag.split("=", 1)
        else:
            try:
                path = next(it)
            except StopIteration:
                parser.error(f"{flag} needs a path")
        pipe.init_source(flag[2:].replace("-", "_"), path)
    pipe.run()
    print(f"Pipeline {pipe.name} completed; outputs in {args.working_dir}")
    return 0


def cmd_diff(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(prog="phaser_spark diff")
    parser.add_argument("pipeline")
    parser.add_argument("working_dir")
    parser.add_argument("--open-browser", action="store_true")
    args = parser.parse_args(argv)

    from ..session import get_spark
    from ..table_diff import IndexedTableDiffer
    from .. import io as pio

    spark = get_spark()
    cls = _find_pipeline_class(args.pipeline)
    pipe = cls(working_dir=args.working_dir, spark=spark)
    names = ["source_copy"] + [f"{ph.name}_output" for ph in pipe.phase_instances]
    # probe the pipeline's own save_format first (orc pipelines were
    # invisible before); a missing expected file is an ERROR — silently
    # skipping it would shift the zip and diff each pair against the
    # WRONG phase's renames
    exts = [pipe.save_format] + [
        e for e in ("csv", "json", "parquet", "orc") if e != pipe.save_format
    ]
    paths = []
    for n in names:
        for ext in exts:
            p = os.path.join(args.working_dir, f"{n}.{ext}")
            if os.path.exists(p):
                paths.append((n, p))
                break
        else:
            raise PhaserError(
                f"diff: no {n}.{{{','.join(exts)}}} in {args.working_dir} — "
                "run the pipeline first (every checkpoint must exist for "
                "phase-aligned diffs)"
            )

    def load_numbered(path):
        from ..constants import PHASER_ROW_NUM
        from ..lineage import with_row_numbers

        df = pio.load_any(spark, path)
        # csv/json copies drop row numbers but are single-file sinks, so
        # re-numbering in read order reproduces ingest order.  Columnar
        # copies KEEP the row-number column (pipeline._source_copy_frame)
        # because a multi-file parquet/orc scan orders splits by size,
        # not write order; this re-number only remains as a best-effort
        # path for pre-existing working dirs written before that fix.
        if PHASER_ROW_NUM not in df.columns:
            df = with_row_numbers(df)
        return df

    out_files = []
    for (n1, p1), (n2, p2), ph in zip(paths, paths[1:], pipe.phase_instances):
        if not ph.diffable():
            # reference diff.py:103-117: a renumber phase rewrites row
            # identity, so an indexed diff would mark every row changed
            print(
                f"Skipping diff of {n1} and {n2} - phase may reorganize data"
            )
            continue
        renames = ph.rename_list
        d = IndexedTableDiffer(
            load_numbered(p1), load_numbered(p2), renamed_columns=renames
        )
        html = d.html()
        out = os.path.join(args.working_dir, f"diff_{n1}__{n2}.html")
        with open(out, "w") as f:
            f.write(html)
        print(f"{n1} → {n2}: {d.summary()}  [{out}]")
        out_files.append(out)
    if args.open_browser and out_files:
        import webbrowser

        webbrowser.open(f"file://{os.path.abspath(out_files[-1])}")
    return 0


def cmd_describe(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(prog="phaser_spark describe")
    parser.add_argument("pipeline")
    parser.add_argument(
        "--json",
        action="store_true",
        help="machine-readable plan summary (for CI gating — pairs with "
        "phaser_spark.plan.assert_scalable)",
    )
    args = parser.parse_args(argv)
    # pipeline modules build Column expressions at import time, which needs
    # a live session even for describe
    from ..session import get_spark

    get_spark()
    cls = _find_pipeline_class(args.pipeline)
    # instantiate when possible: pipelines that build their phase list in
    # __init__ (rather than as a class attribute) would otherwise describe
    # as "0 phases"
    try:
        phases = cls(working_dir=None).phase_instances
    except Exception:
        phases = getattr(cls, "phases", [])
    if args.json:
        import json

        doc = {"pipeline": cls.__name__, "phases": []}
        for p in phases:
            pc = p if isinstance(p, type) else type(p)
            inst = p if not isinstance(p, type) else None
            get = (lambda k, d=None: getattr(inst, k, getattr(pc, k, d)))
            doc["phases"].append(
                {
                    "name": get("name", pc.__name__),
                    "renumber": bool(get("renumber", False)),
                    "error_policy": get("error_policy"),
                    "columns": [
                        {"name": c.name, "type": type(c).__name__}
                        for c in (get("columns", []) or [])
                    ],
                    "steps": [
                        getattr(s, "__name__", str(s))
                        for s in (get("steps", []) or [])
                    ],
                    "extra_sources": [
                        getattr(s, "name", str(s))
                        for s in (get("extra_sources", []) or [])
                    ],
                    "extra_outputs": [
                        getattr(o, "name", str(o))
                        for o in (get("extra_outputs", []) or [])
                    ],
                    "checkpoint_bucket_by": get("checkpoint_bucket_by"),
                    "checkpoint_sort_by": get("checkpoint_sort_by"),
                    "checkpoint_partition_by": get("checkpoint_partition_by"),
                }
            )
        print(json.dumps(doc, indent=1))
        return 0
    print(f"Pipeline {cls.__name__}: {len(phases)} phases")
    for p in phases:
        pc = p if isinstance(p, type) else type(p)
        print(f"  Phase {pc.__name__}")
        for c in getattr(pc, "columns", []):
            print(f"    column {c.name} ({type(c).__name__})")
        for s in getattr(pc, "steps", []):
            print(f"    step {getattr(s, '__name__', s)}")
    return 0


def cmd_debug(argv: list[str]) -> int:
    """Surface parity with the reference's declared-but-unimplemented
    debug command (phaser/cli/commands/debug.py:1-8: "Helpful tools for
    debugging a pipeline (that are not yet implemented)"); exits 0 like
    the reference's empty Command."""
    parser = argparse.ArgumentParser(
        prog="phaser_spark debug",
        description="Pipeline debugging tools (not yet implemented — "
        "matching the reference CLI surface)",
    )
    parser.add_argument("pipeline", nargs="?")
    parser.parse_args(argv)
    print("debug: not yet implemented (reference parity stub)")
    return 0


def cmd_compact(argv: list[str]) -> int:
    """Maintenance: compact a fragmented parquet output directory
    (engine addition — see io.compact_parquet_output; typically run
    against a paused run_stream output table)."""
    parser = argparse.ArgumentParser(prog="phaser_spark compact")
    parser.add_argument("path")
    parser.add_argument(
        "--partition-col",
        default="auto",
        help="hive partition column to preserve; 'auto' (default) uses "
        "__phaser_batch_id__ when present, else unpartitioned; '' forces "
        "unpartitioned",
    )
    parser.add_argument(
        "--target-file-mb", type=int, default=128, help="target output file size"
    )
    parser.add_argument(
        "--sort-by",
        default="",
        help="comma-separated columns: re-cluster by range while compacting",
    )
    parser.add_argument(
        "--zorder-by",
        default="",
        help="comma-separated columns: z-order re-cluster while compacting",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from ..io import compact_parquet_output
    from ..session import get_spark

    spark = get_spark(master=args.master)
    part = args.partition_col or None
    if part == "auto":
        cols = spark.read.parquet(args.path).columns
        part = "__phaser_batch_id__" if "__phaser_batch_id__" in cols else None
    stats = compact_parquet_output(
        spark,
        args.path,
        partition_col=part,
        target_file_bytes=args.target_file_mb * 1024 * 1024,
        sort_by=[c for c in args.sort_by.split(",") if c] or None,
        zorder_by=[c for c in args.zorder_by.split(",") if c] or None,
    )
    print(
        f"compacted {args.path}: {stats['files_before']} -> "
        f"{stats['files_after']} files ({stats['rows']} rows, "
        f"{stats['bytes']} bytes)"
    )
    return 0


def cmd_profile(argv: list[str]) -> int:
    """Profile a table in one aggregation pass (engine addition — see
    ops.profile.profile): null counts, exact distincts, min/max,
    decimal-exact means per column, printed long-form."""
    parser = argparse.ArgumentParser(prog="phaser_spark profile")
    parser.add_argument("path", help="parquet/CSV/JSON table to profile")
    parser.add_argument(
        "--columns", default="", help="comma-separated subset (default: all)"
    )
    parser.add_argument(
        "--approx-distinct",
        action="store_true",
        help="HLL distinct counts (the library default since the exact "
        "path's Expand-node row multiplication; kept for compatibility)",
    )
    parser.add_argument(
        "--exact-distinct",
        action="store_true",
        help="exact distinct counts — multiplies every input row by the "
        "number of profiled columns (Expand); bounded tables only",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)
    if args.approx_distinct and args.exact_distinct:
        parser.error("--approx-distinct and --exact-distinct conflict")

    from ..io import load_any
    from ..ops.profile import profile
    from ..session import get_spark

    spark = get_spark(master=args.master)
    df = load_any(spark, args.path, None)
    cols = [c for c in args.columns.split(",") if c] or None
    rows = profile(df, cols, approx_distinct=not args.exact_distinct).collect()
    width = max(len(r.column) for r in rows)
    for r in rows:
        val = r.value_str if r.value_str is not None else r.value_num
        print(f"{r.column:<{width}}  {r.metric:<12} {val}")
    return 0


COMMANDS = {
    "run": cmd_run,
    "diff": cmd_diff,
    "describe": cmd_describe,
    "debug": cmd_debug,
    "compact": cmd_compact,
    "profile": cmd_profile,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print(f"usage: python -m phaser_spark {{{'|'.join(COMMANDS)}}} ...")
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
