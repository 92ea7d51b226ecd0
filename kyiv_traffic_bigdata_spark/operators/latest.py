"""Latest-row-per-key operators — SURVEY §2.6 W2, §2.4 J2, §2.1 S2.

The reference implements "latest" three ways (running dict compare at
kpt/visualize.py:175-183, last-seen overwrite at 118-126, last-line-wins
at 48-57) — all order-dependent on file iteration. The engine defines ONE
deterministic semantic: latest by (order column, tiebreak) — and uses
``max_by(struct)`` so the whole thing is a single hash aggregate with
map-side partials (no window shuffle + filter, no row_number sort) — the
cheapest plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """One row per key: the payload of the max (order_cols) tuple.

    ``max_by(struct(payload), struct(order))`` — struct comparison is
    lexicographic, so order_cols must form a total order per key (append a
    unique id as final tiebreak). One aggregation, no window, no second
    shuffle; partial aggregation pushes the max to the map side.
    """
    ordering = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in payload_cols])
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, ordering).alias("_latest"))
    return agg.select(
        *key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols]
    )


def dedup_last_write_wins(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """S2 semantics: collapse snapshot repeats, keeping the newest full row.

    Used by the routes-dimension reader (reference kpt/visualize.py:48-57,
    where later JSONL lines overwrite earlier dict entries).
    """
    payload = [c for c in df.columns if c not in key_cols]
    return latest_per_key(df, key_cols, order_cols, payload)


def dedup_exact(df: DataFrame, key_cols: list[str], tiebreak: str) -> DataFrame:
    """Batch twin of the streaming ST3 dedup: one row per key, min tiebreak.

    Unlike ``dropDuplicates`` (arbitrary survivor), the survivor is
    deterministic: the row with the smallest ``tiebreak`` — required for
    oracle comparison and for reproducible 100 TB backfills.
    """
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*payload), F.col(tiebreak)).alias("_first")
    )
    return agg.select(*key_cols, *[F.col(f"_first.{c}").alias(c) for c in payload])


def apply_changelog(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str,
    payload_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog application: materialize current table state from an
    insert/update/delete stream — latest record per key wins, a delete
    tombstone as the latest record removes the key entirely (the Debezium
    / Kafka-compacted-topic semantic).

    Same single-aggregate shape as :func:`latest_per_key` (``max_by`` over
    a total order, map-side partials, no window): the op column rides the
    payload struct and the tombstone filter runs on the one-row-per-key
    result — at 100 TB the changelog shuffles once, keyed, and nothing
    else."""
    latest = latest_per_key(df, key_cols, order_cols, [op_col, *payload_cols])
    return latest.where(F.col(op_col) != delete_op).drop(op_col)
