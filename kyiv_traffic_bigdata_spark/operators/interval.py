"""Interval (point-in-range) join — the range-join scale pattern.

Spark has no range-join optimization: ``points JOIN intervals ON ts
BETWEEN start AND end`` plans as BroadcastNestedLoopJoin (a per-pair
scan — quadratic, a non-starter at 100 TB). The standard fix is **bin
blocking**, the temporal analogue of operators/proximity.py's grid
cells:

1. pick a bin width ≥ the longest interval (computed with one tiny
   aggregate when not supplied);
2. each interval explodes to the bins it covers (≤ 2 copies by the
   width choice); each point maps to exactly ONE bin;
3. equi-join on (keys…, bin) — hash-partitioned, AQE-skew-safe — then
   apply the exact BETWEEN predicate.

A matching pair meets in precisely the point's bin (which the interval
covers by definition), so the blocking is lossless AND duplicate-free —
no dedup pass needed. Candidate volume is points × intervals-per-bin-
neighborhood instead of points × intervals.

Width tuning: a single giant interval forces a wide bin and drags every
short interval's selectivity down with it — split outliers upstream or
pass an explicit ``bin_us`` and accept >2 copies for the outliers (the
explode handles any span).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int | None = None,
) -> DataFrame:
    """Rows of ``points`` × ``intervals`` (same keys) with
    ``start ≤ ts ≤ end``. Timestamps are integers (any unit, used
    consistently); output carries all columns of both sides minus the
    internal bin."""
    if bin_width is None:
        longest = intervals.agg(
            F.max(F.col(end_col) - F.col(start_col))
        ).collect()[0][0]
        bin_width = max(int(longest or 1), 1)
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    pt = points.withColumn("_bin", F.floor(F.col(point_ts) / bin_width))
    return (
        pt.join(iv, [*key_cols, "_bin"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bin")
    )
