"""Tests for streaming event-time windows and the ST2 dimension refresher."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.streaming.analytics import (
    latest_routes_snapshot,
    start_routes_refresher,
    windowed_position_stats,
)
from kyiv_traffic_bigdata_spark.streaming.ingest import (
    ingest_transform,
    replay_text_stream,
)


def test_windowed_stats_streaming_end_to_end(spark, tmp_path):
    """File-replay positions → 5-min tumbling per-route counts, run with
    availableNow into a memory sink."""
    src = tmp_path / "src"
    src.mkdir()
    lines = [
        f'42["locations",["{v},7,50.45,30.52,0,0,{1_770_000_000 + v}"]]'
        for v in range(1, 6)
    ] + ['42["locations",["9,8,50.46,30.53,0,0,1770000100"]]']
    (src / "a.txt").write_text("\n".join(lines) + "\n")

    raw = replay_text_stream(spark, str(src))
    positions = ingest_transform(raw, dedup_ttl_s=None)
    stats = windowed_position_stats(positions, window="5 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("winstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode only emits finalized windows; ingest_ts is wall-clock so
    # the single open window is still unfinalized — assert via a batch
    # re-aggregation of the same transform instead, then the schema shape.
    got = spark.sql("select * from winstats")
    assert got.columns == [
        "window_start", "window_end", "route_id", "n_positions", "n_vehicles",
    ]
    batch = spark.read.text(str(src))
    batch_stats = windowed_position_stats(
        ingest_transform(batch, dedup_ttl_s=None), window="5 minutes"
    )
    rows = {r.route_id: r for r in batch_stats.collect()}
    assert rows[7].n_positions == 5 and rows[7].n_vehicles == 5
    assert rows[8].n_positions == 1


def test_routes_refresher_appends_and_reduces(spark, tmp_path):
    calls = []

    def fake_fetch():
        calls.append(1)
        n = len(calls)
        # catalog evolves: route 2's number changes on later polls
        return [
            {"id": 1, "type": 1, "number": "1"},
            {"id": 2, "type": 3, "number": f"99-v{n}"},
        ]

    out, ckpt = str(tmp_path / "routes"), str(tmp_path / "ckpt")
    q = start_routes_refresher(spark, fake_fetch, out, ckpt, interval_s=1)
    try:
        # wait on durable output (stop() may abort an in-flight poll write)
        deadline = time.time() + 120
        committed = 0
        while time.time() < deadline and committed < 4:
            time.sleep(0.5)
            try:
                committed = spark.read.parquet(out).count()
            except Exception:
                committed = 0
    finally:
        q.stop()
    snaps = spark.read.parquet(out)
    assert snaps.count() >= 4  # at least two full polls landed

    latest = {r.id: r for r in latest_routes_snapshot(spark, out).collect()}
    assert set(latest) == {1, 2}
    last_poll = max(r.poll_number for r in snaps.select("poll_number").collect())
    committed_calls = snaps.select("poll_number").distinct().count()
    assert committed_calls >= 2
    # last write wins: the surviving number is the one from the max poll
    survivor_version = {
        r.poll_number: r.number
        for r in snaps.where(F.col("id") == 2).collect()
    }[last_poll]
    assert latest[2].number == survivor_version
    assert latest[1].number == "1"
