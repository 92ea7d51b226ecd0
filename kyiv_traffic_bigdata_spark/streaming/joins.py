"""Watermarked stream-stream joins — the streaming twin of the batch
interval join (operators/interval.py, query `clicks_after_error`).

Spark's stream-stream inner join keeps both sides in state until the
watermark proves no future match can arrive; an unbounded join condition
therefore means unbounded state. The operator here ALWAYS takes a time
bound (`right_ts` within [left_ts, left_ts + max_delay_s]) plus
watermarks on both sides, so state eviction is provable: a left row can
be dropped once the right watermark passes ``left_ts + max_delay_s``, a
right row once the left watermark passes ``right_ts``. That is the
100 TB posture — join state is O(events inside the watermark horizon),
never O(stream history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay_s: int,
    watermark_s: int = 60,
) -> DataFrame:
    """Inner join: each right event pairs with same-``key`` left events
    whose timestamp precedes it by at most ``max_delay_s`` seconds.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename
    before calling); the shared ``key`` column is coalesced into one
    output column. Event-time watermarks are applied to BOTH sides —
    required by Spark for state cleanup on stream-stream inner joins.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l = left.withWatermark(left_ts, f"{watermark_s} seconds").alias("l")
    r = right.withWatermark(right_ts, f"{watermark_s} seconds").alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + interval {max_delay_s} seconds"
    )
    joined = l.join(r, cond, "inner")
    l_rest = [F.col(f"l.{c}") for c in left.columns if c != key]
    r_rest = [F.col(f"r.{c}") for c in right.columns if c != key]
    return joined.select(F.col(f"l.{key}").alias(key), *l_rest, *r_rest)


def stream_static_enrich(
    stream_df: DataFrame,
    static_dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment (the third streaming join type
    next to the watermarked stream-stream join above and the foreachBatch
    MERGE in streaming/analytics.py): every micro-batch joins against
    the static side, broadcast-hinted — the stream never shuffles for a
    dimension, no state store involved, NO watermark needed (the static
    side is not a stream, so there is nothing to evict).

    Freshness contract: Spark re-evaluates the static side's plan per
    micro-batch, so a dim TABLE whose rows change is picked up — but a
    dim read from a PATH that changes (the versioned upsert store's
    pointer) is not, because the file listing binds at plan time. For
    the versioned store, re-resolve inside foreachBatch with
    ``read_current_dimension`` instead; this helper is for genuinely
    static or table-backed dims (the reference's ST2 routes catalog
    consumption, poller.py:136-189 reading the latest snapshot).
    """
    return stream_df.join(F.broadcast(static_dim), keys, how)
