"""Consecutive-row (lag-window) trajectory operators — SURVEY §2.6 W1.

The reference's flagship computation (kpt/visualize.py:60-88): per vehicle,
sort fixes by timestamp, pair each fix with its predecessor, derive
dt / haversine distance / speed, and drop implausible pairs (dt<=0,
dt>300 s, speed<=0 or >=120 km/h — F5/F6 guards, visualize.py:12-14,75-86).

Spark shape: ONE window ``partition by key order by ts`` feeding all lag
columns — a single hash-partition shuffle + in-partition sort. At 100 TB
this is the canonical "sort within key" pattern; if the store is bucketed
and sorted by (key, ts) (sources.positions writes it that way), Catalyst
elides the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..functions.rounding import round6

from ..config import MAX_PLAUSIBLE_SPEED_KMH, MAX_TIME_GAP_S
from ..functions.geo import haversine_km


def consecutive_deltas(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    carry_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``prev_<c>`` lag-1 columns per key, ordered by (ts, tiebreak).

    Deterministic ordering requires a total order — callers must pass
    tiebreak columns whenever ts can repeat within a key (the shipped
    reference data has ~10% duplicate keys, SURVEY §2.8 ST5).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = df
    for c in [ts_col, *carry_cols]:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    return out


def trajectory_speeds(
    positions: DataFrame,
    key_col: str = "vehicle_id",
    ts_col: str = "timestamp",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_gap_s: int = MAX_TIME_GAP_S,
    max_speed: float = MAX_PLAUSIBLE_SPEED_KMH,
    tiebreak_cols: list[str] | None = None,
    round_speed: int | None = None,
) -> DataFrame:
    """Reference W1: per-key consecutive-fix speeds with plausibility guards.

    Matches kpt/visualize.py:60-88 semantics exactly:
    keep pairs with ``0 < dt <= max_gap_s`` and ``0 < speed < max_speed``;
    speed = haversine_km * 3600 / dt.

    ``round_speed`` optionally rounds the transcendental result (needed
    when a cross-engine oracle re-computes haversine with a different libm).
    """
    lagged = consecutive_deltas(
        positions, [key_col], ts_col, [lat_col, lon_col], tiebreak_cols
    )
    dt = F.col(ts_col) - F.col(f"prev_{ts_col}")
    dist = haversine_km(
        F.col(f"prev_{lat_col}"),
        F.col(f"prev_{lon_col}"),
        F.col(lat_col),
        F.col(lon_col),
    )
    speed: Column = dist * 3600.0 / dt
    if round_speed is not None:
        speed = F.round(speed, round_speed)
    return (
        lagged.where(F.col(f"prev_{ts_col}").isNotNull())
        .withColumn("dt_s", dt)
        .where((F.col("dt_s") > 0) & (F.col("dt_s") <= max_gap_s))
        .withColumn("speed_kmh", speed)
        .where((F.col("speed_kmh") > 0) & (F.col("speed_kmh") < max_speed))
    )


def value_rate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
    max_gap_s: int = 3600,
) -> DataFrame:
    """W1 generalized to any numeric series: per-key d(value)/dt.

    The star-schema analog the correctness gate runs on ``events``:
    dt in seconds from exact integer micros, rate = |Δvalue| / dt.
    Pure int/double per-row arithmetic → bit-identical in any engine.
    """
    lagged = consecutive_deltas(events, [key_col], ts_us_col, [value_col], tiebreak_cols)
    dt_s = (F.col(ts_us_col) - F.col(f"prev_{ts_us_col}")).cast("double") / 1e6
    return (
        lagged.where(F.col(f"prev_{ts_us_col}").isNotNull())
        .withColumn("dt_s", dt_s)
        .where((F.col("dt_s") > 0) & (F.col("dt_s") <= max_gap_s))
        .withColumn(
            "rate",
            round6(F.abs(F.col(value_col) - F.col(f"prev_{value_col}")) / F.col("dt_s")),
        )
    )
