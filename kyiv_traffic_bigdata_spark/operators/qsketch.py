"""Dyadic count-min RANK sketch — mergeable quantiles over range sums.

Completes the sketch family (distinct=KMV, frequency=CMS,
membership=Bloom, **rank=this module**) with the classic
Cormode–Muthukrishnan construction ("An Improved Data Stream Summary:
The Count-Min Sketch and its Applications", J. Algorithms 55(1), 2005,
§4.2): one count-min row set per DYADIC LEVEL of the integer value
domain. A value ``v`` increments, at every level ``ℓ``, the ``depth``
cells addressed by ``v >> ℓ`` — so any dyadic interval's count is a CMS
point query, any prefix rank is a sum of ≤ ``levels`` interval counts,
and any quantile is a ``levels``-step tree descent over those counts.

Chosen over KLL / t-digest deliberately: their compactions are
order-sensitive (KLL flips coins; t-digest merges depend on arrival
order), which breaks this repo's twin discipline. Dyadic-CMS cells are
PLAIN SUMS — associative and commutative — so the streaming twin
(streaming.stateful.streaming_rank_sketch_cells) reaches the
bit-identical sketch no matter how micro-batches slice the input, the
same exact-parity argument as the KMV bottom-k and CMS counter twins.
Cell addressing uses the portable md5 hash (functions.text.
portable_hash) with a ``"j:ℓ:"`` prefix, so the ``depth`` rows at each
level are independent without a second hash family and any engine (or
the driver-side descent below) can recompute a cell address.

Scale posture: the build is a constant ``levels × depth`` fan-out of
the fact scan followed by ONE map-side-combined hash aggregate — the
shuffle out of the scan is bounded by ``groups × levels × depth ×
width`` counter cells per task, independent of row count (the point of
a sketch). The descent runs driver-side over the collected counter
table, which is bounded by the same product (the k×dim-metadata
convention used by kmeans/pca/pq): sketch state is O(log U · d · w),
never O(n).

Error: a CMS point query overestimates by at most ``e·n/w`` with
probability ``1 − e^−depth`` (it never underestimates), so a prefix
rank built from ≤ ``levels`` intervals carries rank error
≤ ``levels · e · n / width`` with high probability — the bound the
error tests pin empirically (tests/test_rank.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash

#: Universe = 2^27 cents ≈ $1.34M — covers o_totalprice at any TPC-H SF
#: (max ≈ $600k) with headroom; levels beyond the data's top bit cost
#: only empty (never-materialized) cells.
QSKETCH_LEVELS = 27
QSKETCH_DEPTH = 3
QSKETCH_WIDTH = 512


def _cell_key(j: int, lvl: int, bucket: Column) -> Column:
    return F.concat(F.lit(f"{j}:{lvl}:"), bucket.cast("string"))


def dyadic_cells(
    value: Column,
    levels: int = QSKETCH_LEVELS,
    depth: int = QSKETCH_DEPTH,
    width: int = QSKETCH_WIDTH,
) -> Column:
    """Array of ``(lvl, j, b)`` structs — the ``levels × depth`` sketch
    cells one integer value increments. Explode against the fact row;
    the downstream counter table is bounded by ``levels × depth ×
    width`` regardless of value cardinality."""
    entries = []
    for lvl in range(levels):
        bucket = F.shiftright(value, lvl)
        for j in range(depth):
            entries.append(
                F.struct(
                    F.lit(lvl).alias("lvl"),
                    F.lit(j).alias("j"),
                    (portable_hash(_cell_key(j, lvl, bucket)) % width).alias(
                        "b"
                    ),
                )
            )
    return F.array(*entries)


def build_rank_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    levels: int = QSKETCH_LEVELS,
    depth: int = QSKETCH_DEPTH,
    width: int = QSKETCH_WIDTH,
) -> DataFrame:
    """Counter table ``(g, lvl, j, b, c)`` of the per-group dyadic-CMS
    sketch over a non-negative LONG value column. One constant-factor
    explode + one hash aggregate (map-side combined); output bounded by
    ``groups × levels × depth × width`` rows."""
    return (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(dyadic_cells(F.col(value_col), levels, depth, width)).alias(
                "s"
            ),
        )
        .select("g", "s.lvl", "s.j", "s.b")
        .groupBy("g", "lvl", "j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _py_portable_hash(s: str) -> int:
    """Driver-side twin of functions.text.portable_hash (md5 hex[0:8])."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def estimate_interval(
    cells: dict,
    g,
    lvl: int,
    bucket: int,
    depth: int = QSKETCH_DEPTH,
    width: int = QSKETCH_WIDTH,
) -> int:
    """CMS point query for one dyadic interval: min over the d rows.
    Never underestimates the true interval count."""
    return min(
        cells.get((g, lvl, j, _py_portable_hash(f"{j}:{lvl}:{bucket}") % width), 0)
        for j in range(depth)
    )


def descend_quantile(
    cells: dict,
    g,
    target: int,
    levels: int = QSKETCH_LEVELS,
    depth: int = QSKETCH_DEPTH,
    width: int = QSKETCH_WIDTH,
) -> int:
    """Tree descent for the ``target``-th smallest value (1-based rank):
    starting at the domain root, at each level compare the remaining
    target against the LEFT child's estimated count and branch; the
    leaf's bucket index is the value estimate. ≤ ``levels`` CMS point
    queries per quantile."""
    p = 0
    remaining = target
    for lvl in range(levels - 1, -1, -1):
        left = estimate_interval(cells, g, lvl, 2 * p, depth, width)
        if remaining <= left:
            p = 2 * p
        else:
            remaining -= left
            p = 2 * p + 1
    return p


def sketch_quantiles(
    spark: SparkSession,
    cell_rows,
    totals: dict,
    quantiles: list[tuple[str, int, int]],
    group_alias: str,
    count_alias: str,
    levels: int = QSKETCH_LEVELS,
    depth: int = QSKETCH_DEPTH,
    width: int = QSKETCH_WIDTH,
    value_scale: float = 100.0,
) -> DataFrame:
    """Per-group quantile estimates from collected sketch cells.

    ``cell_rows`` is the COLLECTED bounded counter table (rows with
    g/lvl/j/b/c); ``totals`` maps group → exact n. Target ranks use the
    same integer arithmetic as operators.rank.quantile_disc_slab
    (``(num·n + num) // den``) so the sketch answers the identical
    question as the exact operator it approximates. Values come back as
    ``bucket / value_scale`` (cents → currency by default)."""
    cells = {(r["g"], r["lvl"], r["j"], r["b"]): r["c"] for r in cell_rows}
    out = []
    for g in sorted(totals):
        n = totals[g]
        row = [g, n]
        for _name, num, den in quantiles:
            target = (num * n + num) // den
            v = descend_quantile(cells, g, target, levels, depth, width)
            row.append(v / value_scale)
        out.append(tuple(row))
    schema = f"{group_alias} string, {count_alias} long, " + ", ".join(
        f"{name} double" for name, _, _ in quantiles
    )
    return spark.createDataFrame(out, schema)
