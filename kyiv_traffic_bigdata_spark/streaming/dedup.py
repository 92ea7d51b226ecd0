"""Streaming near-duplicate filtering — banded MinHash LSH across
micro-batches.

The batch dedup family (operators/dedup.py) answers "which pairs in
this corpus are near-dups"; a live ingestion pipeline needs the online
question instead: "is THIS incoming document a near-dup of anything
already accepted". This module composes the audited batch pieces into a
``foreachBatch`` gate:

* every micro-batch's docs are shingled → MinHash-signed → band-
  bucketed with operators.dedup (portable md5 hashes and prefix-stable
  seeds, so buckets computed today equal the ones persisted yesterday —
  the property incremental_lsh_pairs documents);
* a doc is flagged ``near_dup`` when any of its bands collides with the
  persistent bucket store (an earlier accepted doc) or with a
  smaller-id doc in the same batch (the deterministic intra-batch
  keep-first rule);
* survivors' buckets are appended to the store; per-batch decisions
  land in the output directory.

Semantics: the flag is the banded-LSH CANDIDATE test — the recall-
oriented s-curve gate whose band/row knobs operators/dedup.py documents
— not an exact-Jaccard verdict (an online gate cannot re-shingle the
whole history per doc; the batch pipeline runs exact verification on
the accepted corpus offline). This is the accept/reject split
production crawlers run (bloom-/LSH-gate online, exact dedup offline).

Exactly-once across restarts: foreachBatch may replay a batch id after
a crash, so the bucket append for batch N commits LAST (parquet
``_SUCCESS`` is the commit marker) and a replayed batch whose marker
exists is skipped wholesale; the decisions write is overwrite-mode and
therefore idempotent on the partial-failure path. Same protocol family
as analytics.start_dimension_upsert_sink.

Scale: per batch, cost is the increment's bucket build (bounded by the
batch) plus one equi-join against the store's (band, bh) set — the
cost tracks the increment, not the corpus, exactly like
incremental_lsh_pairs. The store is append-only parquet; compaction is
operators.maintenance.compact_parquet's job.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup as DD
from ..operators.staging import stage


def _hadoop_fs(spark: SparkSession, path_str: str):
    """Resolve (FileSystem, Path) via the Hadoop FS API so the commit
    protocol works against ANY store URI (local, hdfs://, s3a://) — a
    python-glob protocol silently sees zero committed batches on a
    non-local store, which means silently missed cross-batch near-dups,
    not an error."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _committed_batch_dirs(spark: SparkSession, store_dir: str) -> list[str]:
    fs, root = _hadoop_fs(spark, store_dir)
    if not fs.exists(root):
        return []
    jvm = spark._jvm
    out = []
    for st in fs.listStatus(root):
        p = st.getPath()
        name = p.getName()
        if st.isDirectory() and name.startswith("b"):
            if fs.exists(jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")):
                out.append(p.toString())
    return sorted(out)


def neardup_batch_handler(
    store_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
):
    """The foreachBatch callable — exposed for direct unit testing of
    the replay/idempotency contract."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, _ = _hadoop_fs(spark, store_dir)
        jvm = spark._jvm
        bdir = posixpath.join(store_dir, f"b{batch_id}")
        if fs.exists(jvm.org.apache.hadoop.fs.Path(bdir, "_SUCCESS")):
            return  # replayed, already committed
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        # staged once: the bucket frame feeds three consumers below
        nb = stage(DD.lsh_buckets(DD.minhash_signatures(docs, ngram=ngram)))

        prior = _committed_batch_dirs(spark, store_dir)
        dup_sets = []
        if prior:
            store = spark.read.parquet(*prior)
            dup_sets.append(
                nb.join(store, ["band", "bh"], "left_semi").select("doc_id")
            )
        a, b = nb.alias("a"), nb.alias("b")
        dup_sets.append(
            a.join(b, ["band", "bh"])
            .where(F.col("a.doc_id") > F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_id"))
        )
        dups = dup_sets[0]
        for extra in dup_sets[1:]:
            dups = dups.unionByName(extra)
        dups = dups.distinct().withColumn("_dup", F.lit(True))

        decisions = (
            docs.select("doc_id")
            .join(dups, "doc_id", "left")
            .select(
                F.col("doc_id").alias(id_col),
                F.coalesce(F.col("_dup"), F.lit(False)).alias("near_dup"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        decisions.write.mode("overwrite").parquet(
            posixpath.join(out_dir, f"b{batch_id}")
        )
        # bucket append commits LAST — its _SUCCESS is the batch marker
        nb.join(dups, "doc_id", "left_anti").write.mode("overwrite").parquet(bdir)

    return apply


def start_neardup_filter_sink(
    docs: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    trigger_s: int = 5,
) -> StreamingQuery:
    """Attach the near-dup gate to a streaming document frame."""
    return (
        docs.writeStream.foreachBatch(
            neardup_batch_handler(store_dir, out_dir, id_col, text_col, ngram)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_s} seconds")
        .start()
    )
