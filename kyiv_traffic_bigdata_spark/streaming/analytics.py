"""Streaming analytics + dimension refresh — SURVEY §2.8 ST2 and the
event-time window extension.

The reference has NO event-time windows (its 5-s flush is processing-time
batching); tumbling/sliding per-key stats over the position stream are the
idiomatic Spark generalization the SURVEY §2.8 note calls for — marked
extension, watermarked on **ingest time** (device timestamps are years
stale, ST4).

ST2 (30-s routes poll, reference ``kpt/poller/poller.py:136-189``) maps to
a rate-source-driven ``foreachBatch`` that invokes an injected fetcher and
appends timestamped snapshots; the batch read side
(``sources.kpt.read_routes``) already reduces snapshots last-write-wins,
so the refresher only ever appends — no read-modify-write races, and at
scale the dimension history doubles as a slowly-changing-dimension log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEDUP_TTL_S, ROUTES_POLL_INTERVAL_S


def windowed_position_stats(
    positions: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark_s: int = DEDUP_TTL_S,
    ts_col: str = "ingest_ts",
    key_col: str = "route_id",
) -> DataFrame:
    """Tumbling (or sliding) per-key event-time stats over the stream.

    Watermark bounds state: windows older than the watermark finalize and
    evict. Count + approx-distinct only — both merge associatively, so the
    aggregation is map-side partial then one shuffle on (window, key).
    """
    grouped = positions.withWatermark(ts_col, f"{watermark_s} seconds").groupBy(
        F.window(F.col(ts_col), window, slide or window),
        F.col(key_col),
    )
    return grouped.agg(
        F.count(F.lit(1)).alias("n_positions"),
        F.approx_count_distinct("vehicle_id").alias("n_vehicles"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        key_col,
        "n_positions",
        "n_vehicles",
    )


def start_routes_refresher(
    spark: SparkSession,
    fetch_routes: Callable[[], list[dict]],
    out_path: str,
    checkpoint_path: str,
    interval_s: int = ROUTES_POLL_INTERVAL_S,
) -> StreamingQuery:
    """ST2: poll the (injected) route-catalog fetcher every ``interval_s``
    and append a timestamped snapshot partition.

    The rate source provides the trigger clock + exactly-once batch ids;
    the fetcher is driver-side (a 179-row REST call — there is nothing to
    distribute). Failures in one poll fail that micro-batch and retry on
    the next trigger, mirroring the reference's skip-and-continue loop.
    """
    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def poll(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        routes = fetch_routes()
        if not routes:
            return
        snapshot = spark.createDataFrame(
            [(int(batch_id), r["id"], r["type"], r["number"]) for r in routes],
            "poll_number long, id long, type int, number string",
        ).withColumn("poll_ts", F.current_timestamp())
        snapshot.write.mode("append").parquet(out_path)

    return (
        ticks.writeStream.foreachBatch(poll)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{interval_s} seconds")
        .start()
    )


def latest_routes_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Read-side reduce of the refresher's append log: current catalog =
    max_by over (poll_ts, poll_number) per route id (same last-write-wins
    contract as sources.kpt.read_routes)."""
    snaps = spark.read.parquet(path)
    return (
        snaps.groupBy("id")
        .agg(
            F.max_by(
                F.struct("type", "number"), F.struct("poll_ts", "poll_number")
            ).alias("s")
        )
        .select("id", "s.type", "s.number")
    )


# ---------------------------------------------------------------------------
# Streaming MERGE: dimension maintenance as a foreachBatch upsert sink
# ---------------------------------------------------------------------------


def current_dimension_version(store_dir: str) -> str | None:
    """The committed version name (``v{batch_id}``), or None before the
    first batch. The pointer file is the atomic commit: a version dir
    without the pointer update is invisible garbage, never a torn read."""
    import os

    ptr = os.path.join(store_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        return f.read().strip() or None


def read_current_dimension(spark: SparkSession, store_dir: str) -> DataFrame:
    """Reader side of the upsert store: the pointed-at snapshot."""
    v = current_dimension_version(store_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version under {store_dir}")
    import os

    return spark.read.parquet(os.path.join(store_dir, v))


def start_dimension_upsert_sink(
    updates: DataFrame,
    store_dir: str,
    key_cols: list[str],
    checkpoint_path: str,
    order_col: str | None = None,
    trigger_s: int = 5,
) -> StreamingQuery:
    """Streaming MERGE: maintain a keyed dimension snapshot from an
    update stream (the streaming twin of
    operators.maintenance.upsert_parquet, which documents the join
    shape: broadcast anti-join + union, base table never shuffles).

    Each micro-batch writes a NEW version dir (``v{batch_id}``), then
    atomically advances the ``_CURRENT`` pointer (write-to-temp +
    ``os.replace``) — readers always see a complete snapshot, and the
    previous version survives a mid-write death. Exactly-once across
    restarts: foreachBatch may REPLAY a batch id after a crash, so an
    already-committed batch id is detected via the pointer and skipped
    (the upsert would also be idempotent, but skipping avoids rewriting
    the snapshot). Intra-batch duplicate keys collapse last-write-wins
    by ``order_col`` before merging (the S2 rule).

    At scale the version dirs are the slowly-changing-dimension history;
    operators.maintenance.compact_parquet handles retention/compaction.
    """
    import os

    from ..operators.latest import dedup_last_write_wins
    from ..operators.maintenance import upsert_parquet

    os.makedirs(store_dir, exist_ok=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        version = f"v{batch_id}"
        cur = current_dimension_version(store_dir)
        if cur == version:
            return  # replayed batch already committed
        out = os.path.join(store_dir, version)
        if cur is None:
            first = (
                dedup_last_write_wins(batch_df, key_cols, [order_col])
                if order_col is not None
                else batch_df.dropDuplicates(key_cols)
            )
            first.write.mode("overwrite").parquet(out)
        else:
            upsert_parquet(
                spark,
                os.path.join(store_dir, cur),
                batch_df,
                key_cols,
                out,
                order_col=order_col,
            )
        tmp = os.path.join(store_dir, "_CURRENT.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(version)
        os.replace(tmp, os.path.join(store_dir, "_CURRENT"))

    return (
        updates.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_s} seconds")
        .start()
    )


def prune_dimension_versions(
    store_dir: str, keep: int = 3, remove_orphans: bool = False
) -> list[str]:
    """Retention for the upsert store: delete old version dirs, keeping
    the ``keep`` most recent committed ones (the current pointer target
    is always kept regardless). Returns removed names.

    ``remove_orphans=True`` additionally deletes dirs NEWER than the
    pointer. An orphan is invisible garbage by the pointer protocol —
    but a dir the LIVE sink is writing this moment looks identical, and
    deleting it would race the write (the pointer could then commit to
    a half-deleted snapshot). Only pass True when the sink is known
    stopped (offline maintenance); the default prunes committed history
    only, which can never race.

    Driver-side metadata work (a directory listing), same posture as
    operators.maintenance.compact_parquet."""
    import os
    import re
    import shutil

    cur = current_dimension_version(store_dir)
    if cur is None:
        return []
    versions = sorted(
        (
            d
            for d in os.listdir(store_dir)
            if re.fullmatch(r"v\d+", d)
            and os.path.isdir(os.path.join(store_dir, d))
        ),
        key=lambda d: int(d[1:]),
    )
    cur_ord = int(cur[1:])
    committed = [v for v in versions if int(v[1:]) <= cur_ord]
    orphans = (
        [v for v in versions if int(v[1:]) > cur_ord] if remove_orphans else []
    )
    stale = committed[:-keep] if keep > 0 else committed[:-1]
    removed = []
    for v in stale + orphans:
        if v == cur:
            continue
        shutil.rmtree(os.path.join(store_dir, v))
        removed.append(v)
    return removed
