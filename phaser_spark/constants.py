"""Engine-wide constants.

Parity target: the reference's ``phaser/constants.py`` (see SURVEY.md §1,
§2.7).  Same public names so reference pipelines port verbatim:

* ``PHASER_ROW_NUM`` — reference ``phaser/constants.py:2``
* ``ON_ERROR_*`` policies — reference ``phaser/constants.py:4-7``
* format tags — reference ``phaser/constants.py:9-11``

Internal column names (``ERROR_COL`` …) are engine-private: the row-level
error/warning state that the reference keeps in a driver dict
(``phaser/context.py:26``) lives *in the DataFrame* here so it scales.
"""

# Lineage column: 1-based stable row number assigned at ingest
# (reference: phaser/records.py:8, phaser/constants.py:2).
PHASER_ROW_NUM = "__phaser_row_num__"

# Error policies (reference: phaser/constants.py:4-7, phaser/context.py:127-173).
ON_ERROR_COLLECT = "collect"       # record error, keep going, fail phase at end
ON_ERROR_WARN = "warn"             # record warning, continue, phase succeeds
ON_ERROR_DROP_ROW = "drop_row"     # drop the offending row, record event
ON_ERROR_STOP_NOW = "stop_now"     # abort immediately

ERROR_POLICIES = (
    ON_ERROR_COLLECT,
    ON_ERROR_WARN,
    ON_ERROR_DROP_ROW,
    ON_ERROR_STOP_NOW,
)

# The reference's constants carry their own NAME as the value
# (phaser/constants.py:4-7: ON_ERROR_WARN = "ON_ERROR_WARN").  Pipelines
# ported from it may therefore hold literal "ON_ERROR_*" strings where we
# use the short spellings — accept both so porting is truly drop-in.
_POLICY_ALIASES = {p: p for p in ERROR_POLICIES} | {
    "ON_ERROR_COLLECT": ON_ERROR_COLLECT,
    "ON_ERROR_WARN": ON_ERROR_WARN,
    "ON_ERROR_DROP_ROW": ON_ERROR_DROP_ROW,
    "ON_ERROR_STOP_NOW": ON_ERROR_STOP_NOW,
}


def normalize_policy(value, where: str = "on_error"):
    """Map a policy spelling (ours or the reference's) to the canonical
    value; None passes through; anything else raises like the reference
    does (phaser/column.py:83-85)."""
    if value is None:
        return None
    try:
        return _POLICY_ALIASES[value]
    except (KeyError, TypeError):  # TypeError: unhashable (e.g. a list)
        from .exceptions import PhaserError

        raise PhaserError(
            f"Supported {where} values are [{', '.join(ERROR_POLICIES)}] "
            f"(or the reference's ON_ERROR_* spellings); got {value!r}"
        ) from None

# I/O format tags (reference: phaser/constants.py:9-11).
CSV_FORMAT = "csv"
JSON_RECORD_FORMAT = "json"
PARQUET_FORMAT = "parquet"  # engine addition: native columnar checkpoint format

# --- engine-internal DataFrame columns -----------------------------------
# First error attributed to the row (null when the row is clean):
# struct<type string, column string, step string, message string>
ERROR_COL = "__phaser_error__"
# Accumulated warnings: array<struct<type, column, step, message>>
WARNING_COL = "__phaser_warnings__"
# Drop marker set by DropRowException / drop_row policy resolution.
DROP_COL = "__phaser_drop__"
# Name of the builtin step that dropped the row (filter_rows /
# drop_duplicate_rows): lets summarized drop counts be read back from the
# materialized phase checkpoint (a pruned metadata-cheap column scan)
# instead of re-executing the pre-filter plan.
DROP_STEP_COL = "__phaser_drop_step__"
# True once a ROW step has run while this row carried an error: the
# reference physically removes errored rows from its working set at the
# NEXT row step (phaser/phase.py:90-91 `continue` skips appending to
# new_data) — but batch steps that run BEFORE any row step intervenes
# still see (and e.g. filter_rows still drops/counts) the errored row.
# This flag reproduces that visibility rule without removing rows.
SWEPT_COL = "__phaser_swept__"

#: original row number stashed by a ``renumber=True`` phase so events keep
#: their error-time attribution (the reference records events at raise
#: time; renumbering must not rewrite the report's row references)
EVENT_ROW_COL = "__phaser_event_row__"

INTERNAL_COLS = (
    ERROR_COL,
    WARNING_COL,
    DROP_COL,
    DROP_STEP_COL,
    EVENT_ROW_COL,
    SWEPT_COL,
)

# Row steps receive extra sources as driver-materialized Python values
# (reference semantics: phaser assumes small dims —
# tests/pipelines/multi_source_and_outputs.py:65-77).  Materialization
# pulls the whole side into the driver and every task closure, so it is
# CAPPED: oversized sides raise a PhaserError routing the user to
# ops.relational.join_step (broadcast/shuffle), which is the scale path.
# Env-overridable for users who know their executors can hold the map.
import os as _os

ROW_STEP_SOURCE_MAX_ROWS = int(
    _os.environ.get("PHASER_SPARK_ROW_STEP_SOURCE_MAX_ROWS", "100000")
)

# Event types recorded in the events table
# (reference: phaser/context.py:40-76 — ERROR / WARNING / DROPPED_ROW).
EVENT_ERROR = "ERROR"
EVENT_WARNING = "WARNING"
EVENT_DROPPED_ROW = "DROPPED_ROW"
