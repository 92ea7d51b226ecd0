"""Derive a k×-scaled copy of a testdata directory for SCALING curves.

The shipped testdata tops out at sf0.1; the 100 TB posture claims in
SCALING.md argue from plan shapes. This tool makes the next decade of
scale MEASURABLE: it replicates the corpus-scaling tables k times with
FK-CONSISTENT key shifting (copy i shifts every key of a replicated
table by i × stride, where stride = max(source key) + 1, and shifts the
matching foreign-key columns of child tables by the same stride), so
every join/aggregate sees k× the rows with the SAME per-key
distribution — size grows, skew profile doesn't.

Deliberate choices:
- region/nation are NOT replicated: they are bounded enums (25/5 rows
  at every TPC-H scale); replicating them would change the schema's
  semantics, not its size.
- documents use PLANTED near-dup families (r09, VERDICT #5 — the old
  light per-copy suffix left all k copies ~97% shingle-identical, so
  pair output grew ~k²/2 and the dedup family had to be excluded from
  the curve): copy 0 is pristine, copy 1 gets the light suffix (a
  deliberate 2-member near-dup family per source doc — constant-size,
  k-independent), and every token of copies ≥ 2 gets a per-copy
  suffix — a BIJECTION on the token alphabet, so in-copy pairwise
  Jaccard is preserved EXACTLY while cross-copy shingle overlap is
  zero. (A first attempt interleaved a salt token between words; that
  made unrelated same-copy docs share every (salt, w, salt) trigram
  for each common word w and blew candidates up 13,700× — measured,
  not hypothetical.) Net: pair-dedup output grows ~k.
- embeddings replicate with shifted vec_ids; copies ≥ 1 get a small
  deterministic per-(copy, dim) perturbation (±0.01) so replicated
  vectors are not bit-identical (identical copies would make every
  Hamming/cosine neighborhood a degenerate k-way tie). Neighbor
  structure per copy is approximately preserved; the curve measures
  TIME, not neighbor identity.

Usage: python tools/scaleup.py [k] [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

#: key columns OWNED by each replicated table (shift stride derives
#: from the owner's max) and the foreign columns that must follow it.
KEY_FAMILIES = {
    "customer": {
        "owner": ("customer", "c_custkey"),
        "followers": [("orders", "o_custkey")],
    },
    "supplier": {
        "owner": ("supplier", "s_suppkey"),
        "followers": [("lineitem", "l_suppkey")],
    },
    "part": {
        "owner": ("part", "p_partkey"),
        "followers": [("lineitem", "l_partkey")],
    },
    "orders": {
        "owner": ("orders", "o_orderkey"),
        "followers": [("lineitem", "l_orderkey")],
    },
    "event": {
        "owner": ("events", "event_id"),
        "followers": [],
    },
    "user": {
        "owner": ("events", "user_id"),
        "followers": [],
    },
    "doc": {
        "owner": ("documents", "doc_id"),
        "followers": [],
    },
    "vec": {
        "owner": ("embeddings", "vec_id"),
        "followers": [],
    },
}

REPLICATED = (
    "customer supplier part orders lineitem events documents embeddings"
).split()
COPIED_AS_IS = ("region", "nation")


def _strides(spark, src: str) -> dict[tuple[str, str], int]:
    """(table, column) -> shift stride = max(source key) + 1."""
    out: dict[tuple[str, str], int] = {}
    for fam in KEY_FAMILIES.values():
        table, col = fam["owner"]
        m = (
            spark.read.parquet(f"{src}/{table}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        stride = int(m) + 1
        out[(table, col)] = stride
        for ftable, fcol in fam["followers"]:
            out[(ftable, fcol)] = stride
    return out


def scale_table(
    df: DataFrame, table: str, k: int, strides: dict[tuple[str, str], int]
) -> DataFrame:
    copies = df.withColumn(
        "_copy", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    for (t, col), stride in strides.items():
        if t == table:
            copies = copies.withColumn(
                col, F.col(col) + F.col("_copy") * F.lit(stride)
            )
    if table == "documents":
        # per-copy token bijection: "dog" -> "dog~c7" (suffix rides the
        # \S+ backreference; the replacement column varies per row)
        heavy = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1~c"), F.col("_copy").cast("string")),
        )
        copies = copies.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text"))
            .when(
                F.col("_copy") == 1,
                F.concat(F.col("text"), F.lit(" copysalt1")),
            )
            .otherwise(heavy),
        )
    if table == "embeddings":
        copies = copies.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + F.when(F.col("_copy") == 0, F.lit(0.0)).otherwise(
                        ((i * 13 + F.col("_copy") * 7) % 11 - 5).cast(
                            "double"
                        )
                        * F.lit(2e-3)
                    )
                ).cast("float"),
            ),
        )
    return copies.drop("_copy")


def main() -> None:
    from kyiv_traffic_bigdata_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scaled_x{k}"
    spark = get_spark("scaleup")
    strides = _strides(spark, src)
    for t in COPIED_AS_IS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t in REPLICATED:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        scaled = scale_table(df, t, k, strides)
        # spread row groups so scans parallelize like real corpus files
        scaled.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {df.count()} -> {spark.read.parquet(f'{out}/{t}.parquet').count()}")
    spark.stop()


if __name__ == "__main__":
    main()
