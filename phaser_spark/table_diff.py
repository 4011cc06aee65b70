"""Checkpoint table diff (reference ``phaser/table_diff.py``, SURVEY.md §2.9).

``IndexedTableDiffer`` is semantically a **full outer join on the row
number**: each row is classified added / removed / changed / unchanged,
with field-level change detection.  The reference walks two in-memory
tables row by row (``phaser/table_diff.py:18-164``); here the join,
classification, and counters run distributed, and only the rows actually
*rendered* (capped at ``render_limit``) are collected for the HTML
formatter — char-level diffs (``difflib.SequenceMatcher``) happen solely
on that bounded sample, never across the full table.

Rename handling mirrors the reference (``phaser/cli/commands/diff.py:164-182``),
built on ``Phase.rename_list`` — the reference's ``column_rename_dict()``
call is a bug, SURVEY.md §4.3.
"""

from __future__ import annotations

import difflib
import html as _html

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import INTERNAL_COLS, PHASER_ROW_NUM


class IndexedTableDiffer:
    """Diff two checkpoint DataFrames on the row-number index
    (reference ``phaser/table_diff.py:18-164``)."""

    def __init__(
        self,
        f1: DataFrame,
        f2: DataFrame,
        renamed_columns: dict[str, str] | None = None,
        render_limit: int = 1000,
    ):
        self.renamed = dict(renamed_columns or {})
        self.render_limit = render_limit
        # apply declared renames to the old side so columns line up
        for old, new in self.renamed.items():
            if old in f1.columns:
                f1 = f1.withColumnRenamed(old, new)
        self.f1 = f1.drop(*[c for c in INTERNAL_COLS if c in f1.columns])
        self.f2 = f2.drop(*[c for c in INTERNAL_COLS if c in f2.columns])
        self.counters = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
        self._ran = False
        self._rows: list[dict] | None = None
        self.columns = self._merged_columns()

    def _merged_columns(self) -> list[str]:
        cols = [c for c in self.f1.columns if c != PHASER_ROW_NUM]
        for c in self.f2.columns:
            if c != PHASER_ROW_NUM and c not in cols:
                cols.append(c)
        return cols

    def _classified(self) -> DataFrame:
        # rn cast long: CSV checkpoints come back all-string, and a string
        # row number would both orderBy lexicographically ('10' < '2' in
        # the rendered sample) and type-mismatch against a parquet side.
        # The __in_a/__in_b indicators ride the projections INTO the one
        # full-outer join — membership of an all-null row stays correct
        # (the indicator is a literal, never null on a present row) with
        # no extra joins.
        a = self.f1.select(
            F.col(PHASER_ROW_NUM).cast("long").alias("rn"),
            F.lit(1).alias("__in_a"),
            *[F.col(f"`{c}`").cast("string").alias(f"a__{c}") for c in self.f1.columns if c != PHASER_ROW_NUM],
        )
        b = self.f2.select(
            F.col(PHASER_ROW_NUM).cast("long").alias("rn"),
            F.lit(1).alias("__in_b"),
            *[F.col(f"`{c}`").cast("string").alias(f"b__{c}") for c in self.f2.columns if c != PHASER_ROW_NUM],
        )
        j = a.join(b, on="rn", how="full_outer")
        changed = F.lit(False)
        for c in self.columns:
            ac = f"a__{c}" if f"a__{c}" in j.columns else None
            bc = f"b__{c}" if f"b__{c}" in j.columns else None
            av = F.col(f"`{ac}`") if ac else F.lit(None).cast("string")
            bv = F.col(f"`{bc}`") if bc else F.lit(None).cast("string")
            changed = changed | ~(av.eqNullSafe(bv))
        status = (
            F.when(F.col("__in_a").isNull(), F.lit("added"))
            .when(F.col("__in_b").isNull(), F.lit("removed"))
            .when(changed, F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        return j.withColumn("__status", status)

    def classified(self) -> DataFrame:
        """Per-row classification as data: ``(row_num, status)`` with
        status ∈ added/removed/changed/unchanged — the distributed diff
        result itself (the HTML renderer consumes a bounded sample of it)."""
        return self._classified().select(
            F.col("rn").alias("row_num"), F.col("__status").alias("status")
        )

    def run(self) -> dict:
        """Compute classification counters (one distributed aggregate)."""
        j = self._classified()
        counts = {r["__status"]: r["count"] for r in j.groupBy("__status").count().collect()}
        for k in self.counters:
            self.counters[k] = int(counts.get(k, 0))
        self._ran = True
        return dict(self.counters)

    def rows(self) -> list[dict]:
        """Collect a bounded sample of non-unchanged rows for rendering."""
        if self._rows is None:
            j = self._classified()
            sample = (
                j.filter(F.col("__status") != "unchanged")
                .orderBy("rn")
                .limit(self.render_limit)
                .collect()
            )
            self._rows = []
            for r in sample:
                d = r.asDict()
                self._rows.append(
                    {
                        "row_num": d["rn"],
                        "status": d["__status"],
                        "old": {c: d.get(f"a__{c}") for c in self.columns},
                        "new": {c: d.get(f"b__{c}") for c in self.columns},
                    }
                )
        return self._rows

    def summary(self) -> str:
        # _ran, not an all-zero-counter sentinel: an empty-vs-empty diff
        # would otherwise re-run the aggregate on every summary()/html()
        if not self._ran:
            self.run()
        c = self.counters
        return (
            f"{c['added']} rows added, {c['removed']} removed, "
            f"{c['changed']} changed, {c['unchanged']} unchanged"
        )

    def html(self) -> str:
        if not self._ran:
            self.run()
        return HtmlTableFormat(self).render()


class FormatterBase:
    """Pluggable diff formatter (reference ``phaser/table_diff.py:167-200``)."""

    def __init__(self, differ: IndexedTableDiffer):
        self.differ = differ

    def render(self) -> str:
        raise NotImplementedError


class HtmlTableFormat(FormatterBase):
    """HTML diff table with added/removed/changed styling
    (reference ``phaser/table_diff.py:200-338``)."""

    STYLES = {
        "added": "background-color:#d4f7d4",
        "removed": "background-color:#f7d4d4;text-decoration:line-through",
        "changed": "background-color:#fff3c4",
        "unchanged": "",
    }

    @staticmethod
    def _char_diff(old: str | None, new: str | None) -> str:
        if old is None:
            return f"<ins>{_html.escape(new or '')}</ins>"
        if new is None:
            return f"<del>{_html.escape(old)}</del>"
        out = []
        for op, i1, i2, j1, j2 in difflib.SequenceMatcher(
            None, old, new
        ).get_opcodes():
            if op == "equal":
                out.append(_html.escape(old[i1:i2]))
            elif op == "delete":
                out.append(f"<del>{_html.escape(old[i1:i2])}</del>")
            elif op == "insert":
                out.append(f"<ins>{_html.escape(new[j1:j2])}</ins>")
            else:
                out.append(
                    f"<del>{_html.escape(old[i1:i2])}</del>"
                    f"<ins>{_html.escape(new[j1:j2])}</ins>"
                )
        return "".join(out)

    def render(self) -> str:
        d = self.differ
        cols = d.columns
        head = "".join(f"<th>{_html.escape(c)}</th>" for c in ["row #", "status"] + cols)
        body_rows = []
        for row in d.rows():
            style = self.STYLES.get(row["status"], "")
            cells = [f"<td>{row['row_num']}</td>", f"<td>{row['status']}</td>"]
            for c in cols:
                old, new = row["old"].get(c), row["new"].get(c)
                if row["status"] == "changed" and old != new:
                    cells.append(f"<td>{self._char_diff(old, new)}</td>")
                else:
                    cells.append(f"<td>{_html.escape(str(new if new is not None else old or ''))}</td>")
            body_rows.append(f"<tr style='{style}'>" + "".join(cells) + "</tr>")
        return (
            "<table border='1' cellspacing='0'>"
            f"<caption>{_html.escape(d.summary())}</caption>"
            f"<thead><tr>{head}</tr></thead>"
            f"<tbody>{''.join(body_rows)}</tbody></table>"
        )
