"""Z-order layout (operators/layout.py): Morton-key correctness and the
pruning payoff — files written Z-ordered must have narrow per-file
min/max ranges on BOTH dimensions (what parquet stats pruning keys on),
unlike a one-column sort which only narrows its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kyiv_traffic_bigdata_spark.operators.layout import (
    interleave_bits,
    write_zordered,
    zorder_key,
)


def _morton_ref(a: int, b: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_interleave_matches_reference_python(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (2**21 - 1, 2**21 - 1), (123456, 654321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == _morton_ref(r.a, r.b), (r.a, r.b)


def test_zorder_key_is_single_small_aggregate_plus_map(spark):
    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 1000).alias("y")
    )
    out = zorder_key(df, "x", "y")
    assert out.columns == ["x", "y", "_z"]
    # stats join must be a broadcast, not a shuffle join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def _file_spans(path, col):
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            ).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append(hi - lo)
    return spans


def test_zordered_files_narrow_on_both_dims(spark, tmp_path):
    # points on a 100x100 grid in row-major id order: a plain write keeps
    # x runs but scatters nothing; sorting by x alone leaves y spanning
    # the full range in every file. Z-order must narrow BOTH.
    n = 100
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    write_zordered(df, zpath, "x", "y", n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    zx, zy = _file_spans(zpath, "x"), _file_spans(zpath, "y")
    sx, sy = _file_spans(xpath, "x"), _file_spans(xpath, "y")
    full = n - 1
    # single-column sort: x narrow but y useless — EVERY file spans ~all of y
    assert min(sy) >= full * 0.9
    # z-order: most files cover a compact rectangle on BOTH dims. A file
    # whose range boundary straddles a top-level curve-quadrant split can
    # span a full dim — the guarantee is distributional, so assert the
    # mean span and the straddler fraction, not a per-file max.
    def frac_narrow(spans):
        return sum(1 for s in spans if s <= full * 0.6) / len(spans)

    assert frac_narrow(zx) >= 0.75 and frac_narrow(zy) >= 0.75
    assert sum(zx) / len(zx) <= full * 0.5
    assert sum(zy) / len(zy) <= full * 0.5
    # and the payoff vs the one-column sort: mean y-span collapses
    assert sum(zy) / len(zy) < 0.5 * (sum(sy) / len(sy))


def test_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id").alias("x"), (F.col("id") * 13 % 500).alias("y")
    )
    path = str(tmp_path / "z2")
    write_zordered(df, path, "x", "y", n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == ["x", "y"]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_date_partitioned_store_prunes_partitions(spark, tmp_path):
    """ST10 payoff: a date filter on the partitioned positions store must
    reach the scan as a PartitionFilter (pruned directories, zero I/O for
    other days) — the layout contract the daily sink exists for."""
    from pyspark.sql import functions as F

    from kyiv_traffic_bigdata_spark.plans.checks import physical_plan

    df = spark.createDataFrame(
        [(1, "2026-02-07T10:00:00"), (2, "2026-02-08T10:00:00")],
        "vehicle_id long, ingest_ts string",
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))
    out = str(tmp_path / "store")
    (
        df.withColumn("date", F.date_format("ingest_ts", "yyyyMMdd"))
        .write.partitionBy("date")
        .parquet(out)
    )
    import re

    back = spark.read.parquet(out).where(F.col("date") == "20260207")
    plan = physical_plan(back)
    # the date predicate must appear under PartitionFilters, not DataFilters
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "20260207" in m.group(1), plan
    assert back.count() == 1



def test_columnar_and_text_format_roundtrips(spark, sf_dir, tmp_path):
    """Format-layer breadth: the store layer isn't parquet-only — ORC
    (columnar twin), JSON lines, and headered CSV all round-trip the
    same rows bit-for-bit (timestamps through CSV get an explicit
    format; ORC/JSON preserve types natively)."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        .limit(200)
    )
    rows = sorted(map(tuple, li.collect()))

    orc = str(tmp_path / "orc")
    li.write.mode("overwrite").orc(orc)
    assert sorted(map(tuple, spark.read.orc(orc).collect())) == rows

    js = str(tmp_path / "json")
    li.write.mode("overwrite").json(js)
    got_js = (
        spark.read.schema(li.schema).json(js).collect()
    )
    assert sorted(map(tuple, got_js)) == rows

    csv = str(tmp_path / "csv")
    li.write.mode("overwrite").option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv)
    got_csv = (
        spark.read.schema(li.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(csv)
        .collect()
    )
    assert sorted(map(tuple, got_csv)) == rows


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema drift across parquet batches — a certainty over a 100 TB
    store's lifetime — must be readable with mergeSchema: old files
    surface the new column as null, new files keep it, and the unified
    schema is the union."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, "a")], "id long, val string"
    ).write.mode("append").parquet(store)
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, val string, score double"
    ).write.mode("append").parquet(store)

    merged = spark.read.option("mergeSchema", True).parquet(store)
    assert set(merged.columns) == {"id", "val", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 0.5


def test_snapshot_diff_classifies_and_guards_null_collisions(spark):
    from kyiv_traffic_bigdata_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None), (4, "d", "z")],
        "id long, t string, u string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (3, "c\x00null", None), (5, "e", "w")],
        "id long, t string, u string",
    )
    got = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert set(got) == {2, 3, 4, 5}          # id 1 unchanged -> dropped
    assert got[2].change_type == "changed"
    assert got[4].change_type == "removed" and got[4].new_fp is None
    assert got[5].change_type == "added" and got[5].old_fp is None
    # ("c", NULL) vs ("c\x00null", NULL): the field separator + null token
    # must keep these DISTINCT fingerprints (no concat collision)
    assert got[3].change_type == "changed"

    # narrowing compare_cols to u leaves only the membership changes
    # (ids 2 and 3 differ in t, not u)
    assert snapshot_diff(old, new, ["id"], compare_cols=["u"]).count() == 2
