"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 150, "c"), (3, 50, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, 10.0), (1, 150, 20.0), (2, 150, 30.0), (2, 10, 40.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_basic_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r
        for r in asof_join(
            left, right, ["k"], "ts", "ts", right_value_cols=["v"]
        ).collect()
    }
    assert out["a"].asof_v == 10.0  # 90 <= 100, not 150
    assert out["b"].asof_v == 20.0  # latest of {90, 150}
    assert out["c"].asof_v == 30.0  # inclusive: right ts == left ts matches
    assert out["d"].asof_v is None and out["d"].asof_ts is None  # no match


def test_left_rows_all_preserved_no_expansion(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", right_value_cols=["v"])
    assert out.count() == left.count()
    assert sorted(r.tag for r in out.collect()) == ["a", "b", "c", "d"]


def test_duplicate_right_ts_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 7, 1.0), (1, 100, 9, 2.0), (1, 100, 8, 3.0)],
        "k long, ts long, rid long, v double",
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts",
        right_value_cols=["rid", "v"], right_tiebreak="rid",
    ).collect()[0]
    assert out.asof_rid == 9 and out.asof_v == 2.0  # max tiebreak wins


def test_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([(1, 1000), (1, 2000)], "k long, ts long")
    right = spark.createDataFrame([(1, 900, 5.0)], "k long, ts long, v double")
    out = {
        r.ts: r
        for r in asof_join(
            left, right, ["k"], "ts", "ts",
            right_value_cols=["v"], tolerance_s=200,
        ).collect()
    }
    assert out[1000].asof_v == 5.0  # gap 100 <= 200
    assert out[2000].asof_v is None  # gap 1100 > 200 → stale


def test_single_shuffle_plan(spark):
    from kyiv_traffic_bigdata_spark.plans import exchange_count, physical_plan

    left, right = _frames(spark)
    plan = physical_plan(
        asof_join(left, right, ["k"], "ts", "ts", right_value_cols=["v"])
    )
    assert exchange_count(plan) == 1


def test_interval_join_matches_bruteforce_and_is_dup_free(spark):
    """Bin blocking must be lossless (same pairs as the inequality join)
    and duplicate-free (a pair meets in exactly one bin), including
    intervals straddling bin boundaries and spanning multiple bins."""
    from pyspark.sql import functions as F

    from kyiv_traffic_bigdata_spark.operators.interval import interval_join

    pts = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate([5, 99, 100, 101, 150, 250, 1000])]
        + [(2, 100, 100)],
        "k long, pid long, ts long",
    )
    iv = spark.createDataFrame(
        [
            (1, 10, 90, 120),    # straddles the bin boundary at 100
            (1, 11, 0, 500),     # spans many bins
            (1, 12, 140, 160),   # interior
            (2, 13, 90, 120),    # other key
        ],
        "k long, iid long, lo long, hi long",
    )
    got = interval_join(pts, iv, ["k"], "ts", "lo", "hi", bin_width=100)
    pairs = sorted((r.pid, r.iid) for r in got.collect())
    brute = sorted(
        (r.pid, r.iid)
        for r in pts.join(iv, "k")
        .where((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    )
    assert pairs == brute
    assert len(pairs) == len(set(pairs))  # no duplicates from the explode
    # auto width = longest interval (500): still exact
    auto = interval_join(pts, iv, ["k"], "ts", "lo", "hi")
    assert sorted((r.pid, r.iid) for r in auto.collect()) == brute


def test_interval_join_exact_beyond_double_precision(spark):
    """Bin assignment must use exact integer division: int64 nanosecond
    timestamps exceed 2^53, where float floor(ts/width) is off-spec.
    Values here sit 1 below / 1 above a bin boundary near 2^60 — a
    double rounds them ONTO the boundary (ULP is 256 there)."""
    from kyiv_traffic_bigdata_spark.operators.interval import interval_join

    width = 32000
    boundary = ((1 << 60) // width) * width  # exact multiple near 2^60
    pts = spark.createDataFrame(
        [(1, 0, boundary - 1), (1, 1, boundary), (1, 2, boundary + 1)],
        "k long, pid long, ts long",
    )
    iv = spark.createDataFrame(
        [(1, 10, boundary - 5, boundary - 1), (1, 11, boundary, boundary + 5)],
        "k long, iid long, lo long, hi long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pts, iv, ["k"], "ts", "lo", "hi", bin_width=width
        ).collect()
    )
    assert got == [(0, 10), (1, 11), (2, 11)]


def test_interval_join_outlier_width_guard(spark):
    """width_quantile < 1 keeps ONE giant interval from inflating the
    bin for everyone: candidate volume (equi-join matches before the
    BETWEEN filter) must stay bounded, and the result exact."""
    from pyspark.sql import functions as F

    from kyiv_traffic_bigdata_spark.operators.interval import (
        choose_bin_width,
        interval_join,
    )

    # 50 short intervals (width 10) + one 100_000-wide outlier; 500 points.
    iv = spark.createDataFrame(
        [(1, i, i * 200, i * 200 + 10) for i in range(50)]
        + [(1, 99, 0, 100_000)],
        "k long, iid long, lo long, hi long",
    )
    pts = spark.createDataFrame(
        [(1, i, i * 20) for i in range(500)], "k long, pid long, ts long"
    )

    w_max = choose_bin_width(iv, "lo", "hi", 1.0)
    w_q = choose_bin_width(iv, "lo", "hi", 0.9)
    assert w_max == 100_000 and w_q <= 10

    def candidates(width):
        binned = iv.withColumn(
            "_bin", F.explode(F.sequence(
                F.expr(f"lo div {width}"), F.expr(f"hi div {width}")))
        )
        return (
            pts.withColumn("_bin", F.expr(f"ts div {width}"))
            .join(binned, ["k", "_bin"]).count()
        )

    # max-width: every point lands in the outlier's giant bins alongside
    # ~all short intervals → near points×intervals. Quantile width prunes.
    assert candidates(w_q) < candidates(w_max) / 5

    brute = sorted(
        (r.pid, r.iid)
        for r in pts.join(iv, "k")
        .where((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    )
    got = interval_join(pts, iv, ["k"], "ts", "lo", "hi", width_quantile=0.9)
    assert sorted((r.pid, r.iid) for r in got.collect()) == brute
