"""PII detection and redaction for training-data pipelines.

Engine addition (the reference, lisad/phaser, has no text operators);
part of the LLM-data suite alongside :mod:`phaser_spark.ops.text`.

Everything here is a pure Catalyst projection — ``regexp_count`` +
nested ``regexp_replace`` — so redaction whole-stage-codegens, needs no
shuffle, and scales embarrassingly with executors.  The patterns are
written in the common subset of Java regex (Spark) and RE2 (DuckDB,
used as the correctness oracle): no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in APPLICATION ORDER.  Order matters:
# email before phone (digits in the local part must not be eaten as a
# phone), card before ssn/phone (16-digit groups contain 3-4 digit runs),
# ip before phone (dotted triples).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
)

PII_TYPES = tuple(name for name, _, _ in PII_PATTERNS)


def pii_counts(col: SparkCol) -> dict[str, SparkCol]:
    """Per-type match counts on the ORIGINAL text (pre-redaction), so a
    value masked by an earlier rule is still attributed to its own type."""
    return {
        name: F.regexp_count(col, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    }


def redact(col: SparkCol) -> SparkCol:
    """Apply every redaction pattern in :data:`PII_PATTERNS` order."""
    out = col
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Add a redacted copy of ``text_col`` (default ``{text_col}_redacted``)
    plus ``n_email/n_card/n_ssn/n_ip/n_phone`` count columns.

    One projection, zero shuffle — the plan is scan → codegen'd regex
    stage regardless of data size.
    """
    out_col = out_col or f"{text_col}_redacted"
    c = F.col(text_col)
    cols = [df["*"], redact(c).alias(out_col)]
    if with_counts:
        cols.extend(pii_counts(c).values())
    return df.select(*cols)


#: masking methods for mask_columns: name -> column transform
MASK_METHODS = {
    # keyed pseudonymization: equal values get equal tokens (joins and
    # groupBys still work on the masked column), irreversible without
    # the salt
    "sha256": lambda c, salt: F.sha2(F.concat(F.lit(salt), c.cast("string")), 256),
    # keep only the trailing 4 characters (card/account display form);
    # values of 4 or fewer characters are fully masked to a fixed
    # '****' — keeping them would return the value entirely unmasked,
    # and a fixed-width token also avoids leaking the short length
    "last4": lambda c, salt: F.when(
        F.length(c.cast("string")) <= 4, F.lit("****")
    ).otherwise(
        F.concat(
            F.regexp_replace(
                c.cast("string").substr(
                    F.lit(1), F.length(c.cast("string")) - 4
                ),
                ".",
                "*",
            ),
            c.cast("string").substr(F.length(c.cast("string")) - 3, F.lit(4)),
        )
    ),
    # constant token: no residual signal at all
    "redact": lambda c, salt: F.when(c.isNotNull(), F.lit("[MASKED]")),
}


def mask_columns(
    df: DataFrame, methods: dict[str, str], salt: str = ""
) -> DataFrame:
    """Column-level masking/pseudonymization: ``methods`` maps column →
    ``"sha256"`` (salted keyed token — equality-preserving, so the
    masked column still joins/groups), ``"last4"`` (display form —
    values of ≤4 characters become a fixed ``'****'`` rather than
    passing through unmasked), or ``"redact"`` (constant token).
    NULLs stay NULL under every method.

    Pure projection — zero shuffle, zero Python at any size; Catalyst
    fuses it with the surrounding plan.  ``salt`` hardens sha256
    tokens against dictionary reversal; the same salt must be used
    everywhere a token is joined.
    """
    out = df
    for col, method in methods.items():
        if method not in MASK_METHODS:
            raise ValueError(
                f"mask_columns: unknown method {method!r} for {col!r} "
                f"(expected {sorted(MASK_METHODS)})"
            )
        masked = MASK_METHODS[method](F.col(col), salt)
        out = out.withColumn(
            col, F.when(F.col(col).isNotNull(), masked)
        )
    return out
