"""Deterministic sampling for training-data curation.

`df.sample()` is seed-dependent across partitionings and engines, so a
sampled corpus is unreproducible the moment the cluster layout changes —
unacceptable for dataset lineage. These operators instead rank rows by a
content-derived md5 (functions.text.portable recipe): the same rows are
chosen on any engine, any partitioning, any day, and the DuckDB oracle
can replay the exact selection.

Scale: ranking within strata is one shuffle on the strata key; the
per-stratum k cut uses the same TakeOrdered-per-group shape as
operators.topk. For global samples, the hash threshold variant
(``hash_sample``) is map-only — no shuffle at all — because md5 is
uniform: P[md5_prefix(key) < t·2^32] ≈ t.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash
from .topk import top_k_per_group


def sample_hash(key: Column) -> Column:
    """Uniform deterministic [0, 2^32) hash of a key column — the
    engine's single portable-hash recipe (functions.text.portable_hash),
    so the SQL twin is the one shared _PORTABLE_HASH template."""
    return portable_hash(key.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by ascending
    sample hash (ties broken by the key itself — total order, so the
    selection is unique and engine-independent)."""
    hashed = df.withColumn("_sh", sample_hash(F.col(key_col)))
    out = top_k_per_group(
        hashed,
        strata_cols,
        [F.col("_sh").asc(), F.col(key_col).asc()],
        k,
    )
    return out.drop("_sh")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Map-only deterministic ~``fraction`` sample: keep rows whose sample
    hash falls under fraction·2^32. No shuffle, no seed, same rows on any
    engine or partitioning — the 100 TB way to cut a reproducible slice."""
    threshold = int(fraction * (1 << 32))
    return df.where(sample_hash(F.col(key_col)) < threshold)


def weighted_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Corpus mixing: keep a different deterministic fraction of each
    stratum (e.g. up-sample rare languages, down-sample boilerplate-heavy
    domains). Map-only like :func:`hash_sample` — the per-stratum
    threshold is a small CASE cascade, no shuffle, no seed; re-running
    with a larger fraction yields a superset (hash thresholds nest), so
    mixtures can be re-weighted incrementally without re-selecting from
    scratch."""
    thr = F.lit(int(default_fraction * (1 << 32)))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * (1 << 32)))
        ).otherwise(thr)
    return df.where(sample_hash(F.col(key_col)) < thr)
