"""Accuracy contract for the sketch-path aggregates (no SQL oracle —
approximate by design). HLL++ at rsd=0.01 must stay within 2% of the
exact distinct count on every group."""

from __future__ import annotations

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.queries import QUERIES
from kyiv_traffic_bigdata_spark.tables import load_table


def test_approx_distinct_within_2pct(spark, sf_dir):
    approx = {
        r.event_type: r.entities_approx
        for r in QUERIES["approx_event_stats"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, e in exact.items():
        assert abs(approx[t] - e) <= max(1, 0.02 * e), (t, approx[t], e)


def test_approx_avg_matches_exact_path(spark, sf_dir):
    """The non-sketch columns of the approx variant must be identical to
    the exact operator's output (same decimal-stable sum path)."""
    a = {
        r.event_type: (r.avg_value, r.samples)
        for r in QUERIES["approx_event_stats"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    from kyiv_traffic_bigdata_spark.operators.aggregates import stable_avg

    b = {
        r.event_type: (r.avg_value, r.samples)
        for r in ev.groupBy("event_type")
        .agg(stable_avg("value").alias("avg_value"), F.count("value").alias("samples"))
        .collect()
    }
    assert a == b
