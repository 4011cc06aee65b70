"""Exception hierarchy.

Parity target: reference ``phaser/exceptions.py:2-45``.  Same class names and
same semantics:

* ``PhaserError`` — a coding/config bug in the pipeline itself; never
  swallowed by error policies (reference ``phaser/exceptions.py:29-35``).
* ``DataException`` — base for data problems; may carry the offending row
  (reference ``phaser/exceptions.py:2-8``).
* ``DataErrorException`` — data error routed through the active policy.
* ``DropRowException`` — raised by a row step to drop the current row
  (reference ``phaser/exceptions.py:22-26``).
* ``WarningException`` — record a warning and keep going.
"""

from __future__ import annotations


class PhaserError(Exception):
    """Bug in pipeline/engine code (not a data problem) — never swallowed."""


class DataException(Exception):
    """A problem with the data; optionally attributed to a row.

    ``row`` may be a dict (possibly containing ``__phaser_row_num__``) so
    batch steps can attribute an error to a specific row (reference
    ``phaser/exceptions.py:2-8``, ``phaser/phase.py:125-126``).
    """

    def __init__(self, message: str = "", row: dict | None = None):
        super().__init__(message)
        self.message = message
        self.row = row


class DataErrorException(DataException):
    """Data error; handled per the active error policy."""


class DropRowException(DataException):
    """Drop the current row and record a DROPPED_ROW event."""


class WarningException(DataException):
    """Record a warning for the current row and continue."""
