"""Planar neighborhood (radius) joins via grid-cell bucketing (engine
addition): all point pairs within a radius without the all-pairs cross
join Spark would otherwise plan — the spatial-join shape for planar
coordinates, 2-D embedding projections, or any metric grid.

Scale design: with cell size = radius, any pair within the radius lies
in the same or an adjacent cell, so candidates come from an EQUI-join on
the cell key (one side exploded to its 3×3 neighborhood — a constant 9×
fan-out, not quadratic).  Pair work is Σ|cell|·|neighborhood| — bounded
by point density per cell; a pathologically dense cell is the same
hot-key risk as every similarity join here (AQE skew handling /
`salted_join` apply).  Verification is exact squared-distance
arithmetic — pure multiplication, bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def neighbor_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All pairs of rows at planar distance ≤ ``radius`` — returns
    ``(id_a, id_b, dist_sq)`` with ``id_a < id_b`` and ``dist_sq`` the
    exact squared Euclidean distance (squared on purpose: comparisons
    stay in pure multiplication, no library-dependent sqrt in the
    predicate; take ``sqrt`` downstream if a distance column is
    wanted)."""
    if not radius > 0:
        raise PhaserError(f"neighbor_join: radius must be positive, got {radius}")
    r = float(radius)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.select(
        F.col(id_col).alias("__nb_id"),
        x.alias("__nb_x"),
        y.alias("__nb_y"),
        F.floor(x / r).cast("long").alias("__nb_cx"),
        F.floor(y / r).cast("long").alias("__nb_cy"),
    )
    a = base.select(
        F.col("__nb_id").alias("id_a"),
        F.col("__nb_x").alias("xa"),
        F.col("__nb_y").alias("ya"),
        F.col("__nb_cx").alias("cx"),
        F.col("__nb_cy").alias("cy"),
    )
    # explode side b into its 3x3 neighborhood: constant 9x fan-out
    # (generators cannot nest in expressions, so explode the offset
    # PAIRS once and add them in the same projection)
    pairs = F.array(
        *[
            F.struct(F.lit(dx).cast("long").alias("dx"), F.lit(dy).cast("long").alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    b = base.select(
        F.col("__nb_id").alias("id_b"),
        F.col("__nb_x").alias("xb"),
        F.col("__nb_y").alias("yb"),
        "__nb_cx",
        "__nb_cy",
        F.explode(pairs).alias("__nb_off"),
    ).select(
        "id_b",
        "xb",
        "yb",
        (F.col("__nb_cx") + F.col("__nb_off.dx")).alias("cx"),
        (F.col("__nb_cy") + F.col("__nb_off.dy")).alias("cy"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= r * r)
        .select("id_a", "id_b", "dist_sq")
    )
