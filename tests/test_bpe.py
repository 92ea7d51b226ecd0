"""BPE trainer tests (operators/bpe.py): classic merge behavior,
determinism, early stop, and non-overlapping merge semantics."""

from __future__ import annotations


def test_bpe_classic_merge_sequence(spark):
    from kyiv_traffic_bigdata_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "low lower newest newest"),
        ],
        "doc_id long, text string",
    )
    merges, toks = bpe_merges(docs, n_merges=3)
    # pre-tokens are letter runs, so merges operate on adjacent words:
    # the top merge is the most frequent adjacent pair in the corpus
    assert merges, "expected at least one merge"
    assert all(n >= 2 for _, _, n in merges)
    # merged corpus: token arrays contain the concatenated products
    rows = {r.id: list(r.t) for r in toks.collect()}
    joined = [tok for ts in rows.values() for tok in ts]
    assert any(tok == merges[0][0] + merges[0][1] for tok in joined)


def test_bpe_merge_is_deterministic_and_nonoverlapping(spark):
    from kyiv_traffic_bigdata_spark.operators.bpe import bpe_merges, merge_pair
    from pyspark.sql import functions as F

    # "a a a" with merge (a, a) -> ["aa", "a"]: left-to-right rule
    df = spark.createDataFrame([(["a", "a", "a"],)], "t array<string>")
    out = df.select(merge_pair(F.col("t"), "a", "a").alias("m")).collect()
    assert list(out[0].m) == ["aa", "a"]

    docs = spark.createDataFrame(
        [(1, "x y x y x y z")], "doc_id long, text string"
    )
    m1, _ = bpe_merges(docs, n_merges=2)
    m2, _ = bpe_merges(docs.repartition(5), n_merges=2)
    assert m1 == m2
    # (x, y) appears 3x adjacent; it must be the first merge
    assert (m1[0][0], m1[0][1]) == ("x", "y") and m1[0][2] == 3


def test_bpe_early_stop_on_no_repeats(spark):
    from kyiv_traffic_bigdata_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [(1, "every token here unique once")], "doc_id long, text string"
    )
    merges, toks = bpe_merges(docs, n_merges=5)
    assert merges == []
    assert list(toks.collect()[0].t) == [
        "every", "token", "here", "unique", "once",
    ]
