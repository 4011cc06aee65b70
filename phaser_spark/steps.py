"""Step decorators: the user-function surface of the engine.

Parity target: reference ``phaser/steps.py`` (SURVEY.md §2.4):

* ``row_step``       — ``f(row, context=?, **extras) -> dict``
  (``phaser/steps.py:108-133``)
* ``batch_step``     — whole-dataset function (``phaser/steps.py:135-162``)
* ``dataframe_step`` — whole-dataset function, DataFrame-flavored
  (``phaser/steps.py:164-212``)
* ``context_step``   — driver-side ``f(context)`` (``phaser/steps.py:215-229``)

Execution model differences (Spark-first, SURVEY.md §7.1):

* ``row_step`` compiles to **``mapInPandas``** — Arrow-batched, dict-per-row
  adapter, executed on executors.  Rows already quarantined by an ERROR
  event pass through *unchanged* (reference row-skip semantics,
  ``phaser/phase.py:90-91,101-105``); a failing step leaves the row's
  values untouched (value semantics, ``phaser/phase.py:101-105``).
* ``batch_step``/``dataframe_step`` receive the live **Spark DataFrame**
  (the reference hands a list / pandas.DataFrame — at 100 TB only a lazy
  DataFrame makes sense; ``df.toPandas()`` remains the explicit small-data
  escape hatch).  Row-number preservation follows reference rules
  (``phaser/records.py:63-92``): surviving ``__phaser_row_num__`` values
  keep their numbers; rows without one are "new" and get max+1 numbers.
* ``extra_outputs`` on row steps: the reference lets a row function mutate
  a shared dict (``tests/pipelines/families.py:12-16``) — impossible to
  share across executors.  We hand the function a delta-tracking mapping
  and emit each row's numeric deltas through a side column, then reduce
  with ``groupBy().sum()`` — associative, shuffle-light (map-side combine),
  semantically identical for the reference's counting patterns.
"""

from __future__ import annotations

import functools
import inspect
import json
from collections import UserDict
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import (
    DROP_COL,
    DROP_STEP_COL,
    ERROR_COL,
    EVENT_ERROR,
    EVENT_WARNING,
    INTERNAL_COLS,
    PHASER_ROW_NUM,
    SWEPT_COL,
    WARNING_COL,
)
from .exceptions import (
    DataErrorException,
    DataException,
    DropRowException,
    PhaserError,
    WarningException,
)

ROW_STEP = "ROW_STEP"
BATCH_STEP = "BATCH_STEP"
DATAFRAME_STEP = "DATAFRAME_STEP"
CONTEXT_STEP = "CONTEXT_STEP"

_EXTRA_DELTA_COL = "__phaser_extra_deltas__"


def _decorate(fn, step_type, **attrs):
    fn.__phaser_step_type__ = step_type
    for k, v in attrs.items():
        setattr(fn, f"__phaser_{k}__", v)
    return fn


def _step_decorator(step_type, **defaults):
    def build(func=None, **kwargs):
        opts = {**defaults, **kwargs}
        unknown = set(kwargs) - set(defaults)
        if unknown:
            raise PhaserError(f"{step_type} got unknown options {sorted(unknown)}")

        def wrap(f):
            if not callable(f):
                raise PhaserError(f"{step_type} must decorate a callable")
            return _decorate(f, step_type, **opts)

        return wrap(func) if func is not None else wrap

    return build


#: ``@row_step`` — per-row dict in, dict out (phaser/steps.py:108-133).
#: ``output_schema`` (engine addition): DDL string / StructType for steps
#: that add columns; omitted ⇒ inferred from a driver-side sample.
row_step = _step_decorator(
    ROW_STEP, extra_sources=(), extra_outputs=(), output_schema=None
)

#: ``@batch_step`` — whole-dataset ``f(df, ...) -> df``
#: (phaser/steps.py:135-162); ``check_size=True`` warns on row-count change.
#: ``internal=True`` (engine builtins only): the function receives the full
#: DataFrame including lineage/quarantine columns and promises to preserve
#: them — skips the post-step realign join, so e.g. sort order survives.
batch_step = _step_decorator(
    BATCH_STEP, extra_sources=(), extra_outputs=(), check_size=False, internal=False
)

#: ``@dataframe_step`` (phaser/steps.py:164-212) — same execution as
#: batch_step here (the DataFrame *is* the dataset); ``pass_row_nums``
#: keeps signature parity.
dataframe_step = _step_decorator(
    DATAFRAME_STEP,
    extra_sources=(),
    extra_outputs=(),
    check_size=False,
    pass_row_nums=True,
)

#: ``@context_step`` — driver-side logic between steps (phaser/steps.py:215-229).
context_step = _step_decorator(CONTEXT_STEP, extra_sources=(), extra_outputs=())


def step_type_of(fn) -> str:
    t = getattr(fn, "__phaser_step_type__", None)
    if t is None:
        raise PhaserError(
            f"Step {getattr(fn, '__name__', fn)!r} is not decorated with "
            "row_step/batch_step/dataframe_step/context_step"
        )
    return t


def _wants_context(fn) -> bool:
    return "context" in inspect.signature(fn).parameters


class DeltaMapping(UserDict):
    """Dict handed to row steps as an ``extra_output`` accumulator.

    Tracks per-row numeric deltas so distributed partial updates can be
    reduced by summation (the reference's counting idiom,
    ``tests/pipelines/families.py:12-16``).  Missing keys read as 0
    (defaultdict(int) behavior in the reference tests).
    """

    def __init__(self):
        super().__init__()
        self.deltas: dict = {}

    @staticmethod
    def _norm_key(key):
        # pandas turns nullable int columns into float64 — "3" becomes 3.0;
        # normalize integral floats so keys round-trip through JSON as "3".
        # NaN/inf cannot normalize (int() raises) and cannot survive the
        # JSON merge either — reject them with the same clear error the
        # other bad key shapes get
        if isinstance(key, float):
            try:
                as_int = int(key)
            except (ValueError, OverflowError):
                raise PhaserError(
                    f"extra_output keys must be JSON-serializable values; "
                    f"got non-finite float {key!r} — filter or bucket the "
                    "value before using it as a counter key"
                ) from None
            if key == as_int:
                return as_int
        return key

    def __missing__(self, key):
        return 0

    def __getitem__(self, key):
        return super().__getitem__(self._norm_key(key))

    def __setitem__(self, key, value):
        key = self._norm_key(key)
        if not isinstance(key, (str, int, float, bool)) and key is not None:
            # fail HERE with a clear message: a tuple/object key would
            # otherwise crash later inside json.dumps on the executor
            # (keys must survive a JSON round-trip for the distributed
            # delta merge)
            raise PhaserError(
                f"extra_output keys must be str/int/float/bool/None "
                f"(JSON-serializable), got {type(key).__name__}: {key!r} — "
                "stringify compound keys, e.g. f'{a}|{b}'"
            )
        old = self.data.get(key, 0)
        if not isinstance(value, (int, float)):
            raise PhaserError(
                "row_step extra_outputs support numeric accumulation only "
                "(distributed merge is by sum); use a batch_step for "
                "arbitrary side outputs"
            )
        self.deltas[key] = self.deltas.get(key, 0) + (value - old)
        super().__setitem__(key, value)

    def drain(self) -> dict:
        d, self.deltas = self.deltas, {}
        return d


# --------------------------------------------------------------------------
# row_step executor
# --------------------------------------------------------------------------

def _merge_schemas(in_schema: T.StructType, declared) -> T.StructType:
    if declared is None:
        return in_schema
    if isinstance(declared, str):
        declared = T.StructType.fromDDL(declared)
    out = list(in_schema.fields)
    have = {f.name for f in out}
    for f in declared.fields:
        if f.name not in have:
            out.append(f)
    return T.StructType(out)


#: step functions already warned about (one warning per step per process)
_INFER_WARNED: set = set()


def infer_row_step_schema(df: DataFrame, fn, extra_kwargs: dict) -> T.StructType:
    """Sample-based output-schema inference for steps that add columns.

    One tiny driver job (``limit(10)``) — documented cost of the dynamic
    dict API; declare ``output_schema=`` to skip it.  Bounded, but a
    silent driver action and a sampling hazard (a column the first 10
    rows never populate is missed, and a type the sample under-represents
    is guessed wrong), so it warns once per step.
    """
    key = (getattr(fn, "__module__", ""), getattr(fn, "__qualname__", repr(fn)))
    if key not in _INFER_WARNED:
        _INFER_WARNED.add(key)
        import warnings

        warnings.warn(
            f"row_step {getattr(fn, '__name__', fn)!r} declares no "
            "output_schema: inferring added columns from a 10-row driver-"
            "side sample. Columns/types the sample misses are dropped or "
            "mistyped — declare output_schema=\"col type, ...\" for "
            "deterministic schemas (and to skip the sampling job).",
            stacklevel=3,
        )
    visible = df.drop(*[c for c in INTERNAL_COLS if c in df.columns])
    sample = [r.asDict(recursive=True) for r in visible.limit(10).collect()]
    new_fields: dict[str, T.DataType] = {}
    for rec in sample:
        try:
            out = fn(dict(rec), **extra_kwargs)
        except Exception:
            continue
        if not isinstance(out, dict):
            raise PhaserError(
                f"row_step {fn.__name__} must return a Mapping, got {type(out)}"
            )
        for k, v in out.items():
            if k not in visible.columns and k not in new_fields and v is not None:
                new_fields[k] = _python_value_type(v)
    fields = list(df.schema.fields)
    for k, t in new_fields.items():
        fields.append(T.StructField(k, t))
    return T.StructType(fields)


def _python_value_type(v) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, (list, tuple)):
        inner = _python_value_type(v[0]) if v else T.StringType()
        return T.ArrayType(inner)
    if isinstance(v, dict):
        return T.MapType(T.StringType(), T.StringType())
    return T.StringType()


def run_row_step(
    df: DataFrame,
    fn,
    step_name: str,
    phase_name: str,
    extra_source_values: dict | None = None,
    extra_output_names: tuple = (),
    context_vars: dict | None = None,
    output_schema=None,
    strict_schemas: bool = False,
) -> DataFrame:
    """Execute a row step distributed via ``mapInPandas``.

    Quarantined rows (non-null ``__phaser_error__``) pass through unchanged
    (reference ``phaser/phase.py:90-91``).  Exceptions map to markers:
    ``DropRowException`` → drop flag, ``WarningException`` → warning list,
    other ``DataException``/``Exception`` → error struct (policy applied at
    phase end); ``PhaserError`` propagates and fails the job (reference
    "never swallowed", ``phaser/exceptions.py:29-35``).
    """
    extra_source_values = extra_source_values or {}
    declared = getattr(fn, "__phaser_output_schema__", None) or output_schema
    base_kwargs = dict(extra_source_values)
    wants_ctx = _wants_context(fn)

    if declared is None and strict_schemas:
        # at 100 TB a column the 10-row sample never sees is dropped with
        # no error anywhere — strict pipelines refuse the gamble up front
        raise PhaserError(
            f"row_step {step_name!r} declares no output_schema and this "
            "pipeline runs with strict_schemas=True: sample-based schema "
            "inference can silently drop a column the sample misses — "
            "declare @row_step(output_schema=\"col type, ...\")"
        )
    if declared is not None:
        out_schema = _merge_schemas(df.schema, declared)
    else:
        probe_kwargs = dict(base_kwargs)
        if wants_ctx:
            probe_kwargs["context"] = _ExecutorContext(context_vars or {})
        for name in extra_output_names:
            probe_kwargs[name] = DeltaMapping()
        out_schema = infer_row_step_schema(df, fn, probe_kwargs)

    if extra_output_names:
        out_schema = T.StructType(
            list(out_schema.fields) + [T.StructField(_EXTRA_DELTA_COL, T.StringType())]
        )

    out_names = [f.name for f in out_schema.fields]
    visible_names = [c for c in out_names if c not in INTERNAL_COLS and c != _EXTRA_DELTA_COL]
    ctx_vars = dict(context_vars or {})
    want_extras = tuple(extra_output_names)

    def gen(batches):
        import pandas as pd

        accs = {name: DeltaMapping() for name in want_extras}
        exec_ctx = _ExecutorContext(ctx_vars)
        for pdf in batches:
            pdf = pdf.astype(object).where(pdf.notna(), None)
            rows_out = []
            for rec in pdf.to_dict("records"):
                err = rec.get(ERROR_COL)
                # no `or []`: two-plus accumulated warnings arrive as a
                # numpy array, whose truth value raises (found by the
                # randomized differential generator — any row warned twice
                # before a row step crashed the whole stage)
                prior_warnings = rec.get(WARNING_COL)
                warnings = [] if prior_warnings is None else list(prior_warnings)
                drop = bool(rec.get(DROP_COL) or False)
                drop_step = rec.get(DROP_STEP_COL)
                base = {k: rec.get(k) for k in visible_names}
                deltas = None
                if err is None and not drop:
                    kwargs = dict(base_kwargs)
                    if wants_ctx:
                        kwargs["context"] = exec_ctx
                    for name in want_extras:
                        kwargs[name] = accs[name]
                    try:
                        newrow = fn(dict(base), **kwargs)
                        if not isinstance(newrow, dict):
                            raise PhaserError(
                                f"row_step {step_name} must return a Mapping, "
                                f"got {type(newrow)}"
                            )
                        if (
                            PHASER_ROW_NUM in newrow
                            and newrow[PHASER_ROW_NUM] != base.get(PHASER_ROW_NUM)
                        ):
                            raise PhaserError(
                                f"row_step {step_name} changed {PHASER_ROW_NUM} "
                                "(reference phaser/steps.py:120-127 forbids this)"
                            )
                        merged = dict(base)
                        merged.update(newrow)
                        base = {k: merged.get(k) for k in visible_names}
                        if want_extras:
                            deltas = {
                                n: accs[n].drain() for n in want_extras
                            }
                    except DropRowException as e:
                        drop = True
                        warnings.append(
                            {
                                "type": "DROPPED_ROW",
                                "column": None,
                                "step": step_name,
                                "message": str(e) or "row dropped",
                                "policy": None,
                            }
                        )
                        for n in want_extras:
                            accs[n].drain()  # discard this row's partial updates
                    except WarningException as e:
                        warnings.append(
                            {
                                "type": EVENT_WARNING,
                                "column": None,
                                "step": step_name,
                                "message": str(e),
                                "policy": None,
                            }
                        )
                        if want_extras:
                            deltas = {n: accs[n].drain() for n in want_extras}
                    except PhaserError:
                        raise
                    except Exception as e:  # DataException & arbitrary errors
                        err = {
                            "type": EVENT_ERROR,
                            "column": None,
                            "step": step_name,
                            "message": f"{type(e).__name__}: {e}",
                            "policy": None,
                        }
                        for n in want_extras:
                            accs[n].drain()
                out = dict.fromkeys(out_names)
                out.update(base)
                out[ERROR_COL] = err
                out[WARNING_COL] = warnings
                out[DROP_COL] = drop
                # preserve drop attribution: dict.fromkeys(out_names)
                # would otherwise reset it to None and the deferred
                # 'step X dropped N rows' count would read 0
                out[DROP_STEP_COL] = drop_step
                # same for the swept flag (errored-row visibility to
                # later batch steps — set at row-step entry in phase.py)
                if SWEPT_COL in out_names:
                    out[SWEPT_COL] = bool(rec.get(SWEPT_COL) or False)
                if want_extras:
                    out[_EXTRA_DELTA_COL] = json.dumps(deltas) if deltas else None
                rows_out.append(out)
            yield pd.DataFrame(rows_out, columns=out_names)

    result = df.mapInPandas(gen, schema=out_schema)
    return result


class _ExecutorContext:
    """Read-only context visible inside executor-side row functions."""

    def __init__(self, variables: dict):
        self.variables = dict(variables)

    def get(self, name, default=None):
        return self.variables.get(name, default)

    def add_variable(self, *_a, **_k):
        raise PhaserError(
            "context.add_variable is driver-only; use a context_step "
            "(reference phaser/steps.py:215-229)"
        )

    def add_warning(self, message, **_k):
        raise WarningException(message)

    def add_error(self, message, **_k):
        raise DataErrorException(message)


def extract_extra_output_deltas(df: DataFrame, output_names: tuple) -> dict[str, DataFrame]:
    """Reduce the per-row delta column into one DataFrame per extra output:
    ``(key string, value double)`` via explode + groupBy().sum() —
    associative, map-side-combined."""
    out: dict[str, DataFrame] = {}
    if _EXTRA_DELTA_COL not in df.columns:
        return out
    parsed = df.select(
        F.from_json(
            F.col(_EXTRA_DELTA_COL),
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.DoubleType())),
        ).alias("d")
    ).filter(F.col("d").isNotNull())
    for name in output_names:
        exploded = parsed.select(F.explode(F.element_at(F.col("d"), name)).alias("key", "delta"))
        out[name] = (
            exploded.groupBy("key").agg(F.sum("delta").alias("value"))
        )
    return out
