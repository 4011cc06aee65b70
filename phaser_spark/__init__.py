"""phaser_spark — a PySpark-native batch ETL pipeline engine.

A ground-up Spark implementation of the capabilities of the reference
``lisad/phaser`` project (declarative column contracts, phase/pipeline
orchestration, row-number lineage, error-policy quarantine, checkpoints,
table diffs), designed for 100 TB scale: DataFrames everywhere, events as
data, zero-shuffle lineage, broadcast side-inputs, and native Catalyst
expressions for every declarative feature.

Public API parity: same exported names as the reference
(``phaser/__init__.py:32-46`` — SURVEY.md §2.12).
"""

from .column import (
    BooleanColumn,
    Column,
    DateColumn,
    DateTimeColumn,
    FloatColumn,
    IntColumn,
    make_strict_name,
)
from .constants import (
    CSV_FORMAT,
    JSON_RECORD_FORMAT,
    ON_ERROR_COLLECT,
    ON_ERROR_DROP_ROW,
    ON_ERROR_STOP_NOW,
    ON_ERROR_WARN,
    PHASER_ROW_NUM,
)
from .context import Context
from .exceptions import (
    DataErrorException,
    DataException,
    DropRowException,
    PhaserError,
    WarningException,
)
from .io import (
    ExtraMapping,
    ExtraRecords,
    read_csv,
    read_json,
    read_jsonl,
    save_csv,
    save_json,
    save_jsonl,
)
from .builtin_steps import (
    check_unique,
    drop_duplicate_rows,
    filter_rows,
    flatten_all,
    flatten_column,
    sort_by,
)
from .phase import Phase
from .pipeline import DagPipeline, Pipeline
from .session import get_spark
from .steps import batch_step, context_step, dataframe_step, row_step
from .table_diff import FormatterBase, HtmlTableFormat, IndexedTableDiffer

__version__ = "0.1.0"

__all__ = [
    "Pipeline", "DagPipeline", "Phase", "Context", "PHASER_ROW_NUM",
    "ON_ERROR_COLLECT", "ON_ERROR_WARN", "ON_ERROR_DROP_ROW", "ON_ERROR_STOP_NOW",
    "JSON_RECORD_FORMAT", "CSV_FORMAT",
    "PhaserError", "DataErrorException", "DataException", "DropRowException",
    "WarningException",
    "row_step", "batch_step", "dataframe_step", "context_step",
    "check_unique", "sort_by", "filter_rows", "flatten_column", "flatten_all",
    "drop_duplicate_rows",
    "Column", "IntColumn", "DateColumn", "DateTimeColumn", "FloatColumn",
    "BooleanColumn",
    "read_csv", "read_json", "read_jsonl", "save_csv", "save_json", "save_jsonl",
    "ExtraMapping", "ExtraRecords",
    "HtmlTableFormat", "FormatterBase", "IndexedTableDiffer",
    "get_spark", "make_strict_name",
]
