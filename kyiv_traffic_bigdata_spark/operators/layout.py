"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

At 100 TB the fastest scan is the one that never happens: parquet
row-group/file min-max stats prune reads, but only if the writer
co-locates similar values. A single-column sort prunes one predicate
dimension; interleaving the bits of two (or more) dimension keys into a
Z-value and range-partition-sorting by it gives BOTH dimensions locality
— the standard Z-order/space-filling-curve layout (public technique:
Morton order; used by Delta Lake OPTIMIZE ZORDER, Iceberg sort orders).

Everything here is map-only expression work plus ONE range repartition
(the write's clustering shuffle — unavoidable and linear); the min/max
normalization bounds are a 1-row aggregate collect (metadata).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension. 2 dims x 21 bits = 42-bit Z-values — fits long
#: with headroom; 2^21 distinct buckets per dimension is far finer than
#: any realistic file/row-group count.
ZORDER_BITS = 21


def interleave_bits(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave two non-negative ints (a's bit i -> bit 2i+1,
    b's bit i -> bit 2i): unrolled shift/and/or chain — pure codegen'd
    arithmetic, no UDF. Inputs must already be in [0, 2^bits)."""
    al, bl = a.cast("long"), b.cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(al, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(bl, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def normalize_to_bits(c: Column, lo: Column, hi: Column, bits: int = ZORDER_BITS) -> Column:
    """Affine-map a value from [lo, hi] onto the [0, 2^bits) grid
    (constant columns lo/hi come from a 1-row stats aggregate). A
    degenerate range (lo == hi) maps everything to 0."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span == 0, F.lit(0.0)).otherwise(
        (c.cast("double") - lo.cast("double")) / span
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = ZORDER_BITS
) -> DataFrame:
    """Attach a ``_z`` Morton key over two numeric columns, normalized by
    their global min/max (one tiny aggregate, crossJoin-broadcast back —
    4 scalars of metadata, never a shuffle side)."""
    stats = df.agg(
        F.min(col_a).alias("_alo"),
        F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"),
        F.max(col_b).alias("_bhi"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    z = interleave_bits(
        normalize_to_bits(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits),
        normalize_to_bits(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits),
        bits,
    )
    return with_stats.withColumn("_z", z).drop("_alo", "_ahi", "_blo", "_bhi")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write parquet clustered by the Z-curve over (col_a, col_b):
    range-repartition on ``_z`` (AQE-balanced, skew handled by the range
    sampler) then sort within partitions, so every output file covers a
    compact Z-range — and therefore a compact rectangle in (a, b) space
    that parquet min/max stats can prune on either column."""
    (
        zorder_key(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
