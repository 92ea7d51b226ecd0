"""Greedy BPE merge training over the corpus — the tokenizer-TRAINING
workload next to the counting/budgeting queries (queries.doc_subword_stats,
doc_token_pair_stats).

Classic byte-pair-encoding construction (Sennrich et al., 2016), Spark-
shaped: each round finds the corpus-wide most frequent ADJACENT token
pair (one hash aggregate with map-side partials + a TakeOrdered-1) and
rewrites every document's token array with that pair merged (map-only
fold). The driver holds only the merge table — ``n_merges`` rows of
metadata — never token data; corpus size only adds map tasks per round.

Scale notes:

* the pair count is the dominant cost per round and is exactly the
  doc_token_pair_stats aggregate — partials absorb the position fan-out;
* the token frame is lineage-truncated per round (localCheckpoint):
  ``n_merges`` nested array-rewrite lambdas would otherwise stack into
  one interpreter-bound mega-expression (the InferFilters/staging traps
  documented in operators/dedup.py apply verbatim);
* ties break lexicographically on (a, b), so the merge sequence is a
  pure function of the corpus — reruns and engines agree;
* the left-to-right non-overlapping merge rule falls out of the fold:
  once a pair merges, its product cannot immediately re-merge with the
  consumed right element (``"a a a"`` at merge (a,a) → ``["aa","a"]``,
  the standard BPE behavior).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import subword_tokens


def adjacent_pair_counts(tokens_df: DataFrame, tokens_col: str = "t") -> DataFrame:
    """(a, b, n) counts of adjacent token pairs — one explode + one
    partial-aggregated hash aggregate."""
    t = F.col(tokens_col)
    pairs = tokens_df.where(F.size(t) >= 2).select(
        F.explode(F.sequence(F.lit(1), F.size(t) - 1)).alias("_i"),
        t.alias("_t"),
    ).select(
        F.element_at("_t", F.col("_i")).alias("a"),
        F.element_at("_t", F.col("_i") + 1).alias("b"),
    )
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))


def merge_pair(tokens: Column, a: str, b: str) -> Column:
    """Map-only rewrite of a token array with adjacent (a, b) merged
    left-to-right (non-overlapping, the BPE rule)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        tokens,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` greedy BPE merges over the corpus.

    Returns ``(merges, tokens_df)``: the ordered merge table
    [(a, b, count), ...] and the final tokenized corpus
    (id, t:array<string>) with all merges applied. Stops early when no
    adjacent pair repeats (every count ≤ 1 carries no signal).
    """
    t = docs.select(
        F.col(id_col).alias("id"), subword_tokens(F.col(text_col)).alias("t")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            adjacent_pair_counts(t)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break
        a, b, n = top[0].a, top[0].b, int(top[0].n)
        merges.append((a, b, n))
        t = t.select(
            "id", merge_pair(F.col("t"), a, b).alias("t")
        ).localCheckpoint(eager=True)
    return merges, t
