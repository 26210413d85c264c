"""Streaming near-dup gate: incoming documents are checked against a
PERSISTED MinHash-LSH bucket store and only novel documents pass.

The 10^12-row crawl shape: the seen-store is an append-only (band, bucket)
parquet table (bucketed/partitioned by bucket hash at real scale); each
micro-batch

1. computes band buckets for its documents (`operators.dedup.lsh_buckets` —
   the same index the batch pair-generator uses),
2. drops any document colliding with the store on ANY band (LSH candidate
   ⇒ near-duplicate of something already accepted; threshold tuning =
   bands/rows, exactly as in batch),
3. also dedups WITHIN the batch (keep the smallest id per bucket chain),
4. writes the surviving documents to the output sink FIRST, then appends
   their buckets to the store (retry-safe order — see process()).

foreachBatch gives at-least-once semantics on retry: re-appending a
surviving doc's buckets is harmless (duplicate (id, band, bucket) rows
change no join result), and the output sink dedups by id downstream —
the same idempotence argument as the batch manifest resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_buckets


def novel_against_store(batch: DataFrame, seen: DataFrame | None,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """(novel_docs, their_buckets): docs not LSH-colliding with `seen` nor
    with an earlier (smaller-id) doc in the same batch.

    The bucket table is localCheckpoint'ed (not cached): it is read by both
    returned frames AND the caller appends to the store the seen-join
    reads — the same invalidation hazard as plans/pipeline.py; a checkpoint
    is immune and leaves nothing to unpersist per micro-batch."""
    buckets = lsh_buckets(batch, id_col, text_col).localCheckpoint(eager=True)
    hit = buckets.join(seen, ["band", "bucket"], "left_semi") if seen is not None \
        else buckets.limit(0)
    dup_ids = hit.select("id").distinct()
    # within-batch: keep the minimum id of each bucket group
    first_per_bucket = buckets.groupBy("band", "bucket").agg(
        F.min("id").alias("keep_id"))
    batch_dups = (
        buckets.join(first_per_bucket, ["band", "bucket"])
        .where(F.col("id") != F.col("keep_id"))
        .select("id").distinct()
    )
    drop = dup_ids.union(batch_dups).distinct()
    novel = batch.join(drop.withColumnRenamed("id", id_col), id_col,
                       "left_anti")
    novel_buckets = buckets.join(drop, "id", "left_anti")
    # materialize BOTH results before the caller writes: their plans read
    # the seen store the caller is about to append to (and novel_buckets
    # would otherwise be appended into a path its own plan reads)
    return (novel.localCheckpoint(eager=True),
            novel_buckets.localCheckpoint(eager=True))


def run_streaming_dedup(spark: SparkSession, src_dir: str, schema,
                        out_dir: str, seen_dir: str, checkpoint_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_files_per_trigger: int = 1) -> None:
    """Drain available document files through the near-dup gate
    (availableNow), maintaining the bucket store across micro-batches AND
    across restarts (the store itself is the persistent state — no
    in-memory streaming state to lose)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def process(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        seen = sp.read.parquet(seen_dir) if os.path.exists(seen_dir) else None
        novel, nb = novel_against_store(batch, seen, id_col, text_col)
        # OUTPUT FIRST, store second: if the job dies between the writes, a
        # retry re-runs the batch against a store that does NOT yet contain
        # its own buckets, so the docs are re-emitted (at-least-once
        # duplicates in the sink — dedup by id downstream). The reverse
        # order would make a retried batch LSH-collide with itself and
        # silently drop every document.
        novel.write.mode("append").parquet(out_dir)
        nb.select("band", "bucket").write.mode("append").parquet(seen_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
