"""PII scrubbing (functions/text.py redact_pii / pii_counts).

Fixture-tested rather than corpus-registered: the driver's synthetic
documents contain no '@', digits, or URLs, so a registered query would
be trivially all-zero. The capability contract — ordered replace chain,
per-kind counts, map-only plan — is pinned here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.functions.text import pii_counts, redact_pii


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select(
        "id",
        redact_pii(F.col("text")).alias("clean"),
        pii_counts(F.col("text")).alias("c"),
    ).collect()
    return {r.id: r for r in rows}


def test_email_url_ip_phone_redaction(spark):
    got = _run(
        spark,
        [
            "contact alice.smith+x@example.co.uk today",
            "see https://example.com/a?b=c#d for details",
            "server at 192.168.1.254 is up",
            "call +1 (415) 555-0199 now",
            "no pii here at all",
        ],
    )
    assert got[0].clean == "contact <EMAIL> today" and got[0].c.email == 1
    assert got[1].clean == "see <URL> for details" and got[1].c.url == 1
    assert got[2].clean == "server at <IP> is up" and got[2].c.ipv4 == 1
    assert got[3].clean == "call <PHONE> now" and got[3].c.phone == 1
    assert got[4].clean == "no pii here at all"
    assert (got[4].c.email, got[4].c.url, got[4].c.ipv4, got[4].c.phone) == (0, 0, 0, 0)


def test_order_email_inside_url_text(spark):
    # email redacts first, then the URL pattern consumes the rest of the
    # non-space run (placeholder included) — the whole thing ends up
    # <URL>; counts see both kinds independently against the original
    got = _run(spark, ["ping http://example.com/?to=bob@mail.org ok"])
    r = got[0]
    assert r.clean == "ping <URL> ok"
    assert r.c.email == 1 and r.c.url == 1


def test_multiple_matches_counted_and_replaced(spark):
    got = _run(spark, ["a@b.io c@d.io 10.0.0.1 10.0.0.2"])
    r = got[0]
    assert r.clean == "<EMAIL> <EMAIL> <IP> <IP>"
    assert r.c.email == 2 and r.c.ipv4 == 2


def test_redaction_is_map_only(spark):
    df = spark.range(10).select(F.col("id"), F.lit("x a@b.io y").alias("text"))
    plan = (
        df.select(redact_pii(F.col("text")).alias("t"), pii_counts(F.col("text")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
