"""Streaming near-dup gate: incoming documents are checked against a
PERSISTED MinHash-LSH bucket store and only novel documents pass.

The 10^12-row crawl shape: the seen-store is an append-only parquet table
PARTITIONED by ``bp = pmod(xxhash64(band, bucket), STORE_PARTITIONS)`` —
the same hash-bucketed layout an Iceberg table would use. Each micro-batch

1. computes band buckets for its documents (`operators.dedup.lsh_buckets` —
   the same index the batch pair-generator uses) and their bp values,
2. reads the store PRUNED to the batch's bp partitions (an isin over the
   partition column → static partition pruning; a micro-batch of B docs
   touches at most min(B·bands, STORE_PARTITIONS) partitions, NOT the whole
   monotonically-growing store — the r3 full-scan-per-micro-batch fix),
3. drops any document colliding with the store on ANY band (LSH candidate
   ⇒ near-duplicate of something already accepted; threshold tuning =
   bands/rows, exactly as in batch), and dedups WITHIN the batch
   (keep the smallest id per bucket chain),
4. writes the surviving documents to the output sink FIRST, then appends
   their buckets to the store (retry-safe order — see process()).

Duplicate (band, bucket) rows accumulate across appends (they change no
join result — the lookup is a semi-join); `plans.maintenance.compact_table`
is the MERGE-equivalent job that rewrites the store deduplicated, keeping
the partitioned layout.

foreachBatch gives at-least-once semantics on retry: re-appending a
surviving doc's buckets is harmless, and the output sink dedups by id
downstream — the same idempotence argument as the batch manifest resume.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_buckets

#: store partition count — at 10^12 scale raise this so each partition's
#: bucket file set stays executor-sized; the lookup cost per micro-batch is
#: bounded by the batch's own bucket count either way. The value is BAKED
#: INTO the store's bp values, so an existing store must be read with the
#: modulus it was written with — it is persisted in _STORE_META.json at
#: store creation and VALIDATED on every run (a silent mismatch would
#: prune the wrong partitions and re-admit every seen duplicate). To
#: change it, rewrite the store (recompute bp) — not just the parameter.
STORE_PARTITIONS = 64

_META_NAME = "_STORE_META.json"  # leading '_': ignored by Spark's listing


def store_meta_partitions(seen_dir: str) -> int | None:
    """The modulus the store at `seen_dir` was written with, or None if the
    store doesn't exist yet."""
    p = os.path.join(seen_dir, _META_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["store_partitions"])


def read_store_meta(seen_dir: str) -> dict | None:
    """The full persisted store metadata dict, or None if absent."""
    p = os.path.join(seen_dir, _META_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_store_meta(seen_dir: str, n_parts: int,
                     extra: dict | None = None) -> None:
    """Atomic (tmp + rename) and idempotent: an in-place truncate-write
    could be caught mid-flush by a crash, leaving unparseable JSON that
    bricks every later `_resolve_store_partitions`; a no-op when the meta
    already holds the same values (the per-micro-batch call path).

    `extra` merges additional layout-defining fields into the meta (the
    incremental batch index persists its LSH signature config — bucket
    values are only comparable when n/num_perm/bands/shingle match)."""
    existing = read_store_meta(seen_dir)
    if existing is not None \
            and existing.get("store_partitions") == int(n_parts) \
            and all(existing.get(k) == v for k, v in (extra or {}).items()):
        return  # nothing to change; never drop fields another writer set
    meta = {**(existing or {}), "store_partitions": int(n_parts),
            **(extra or {})}
    os.makedirs(seen_dir, exist_ok=True)
    tmp = os.path.join(seen_dir, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(seen_dir, _META_NAME))


def _resolve_store_partitions(seen_dir: str, requested: int) -> int:
    persisted = store_meta_partitions(seen_dir)
    if persisted is None:
        return requested
    if persisted != requested:
        raise ValueError(
            f"LSH store at {seen_dir} was written with "
            f"store_partitions={persisted}, but {requested} was requested — "
            "reading with a different modulus would prune the WRONG "
            "partitions and silently re-admit seen duplicates. Rewrite the "
            "store (recomputing bp) to change the partition count."
        )
    return persisted


def store_partition_expr(band: Column, bucket: Column,
                         n_parts: int = STORE_PARTITIONS) -> Column:
    """bp = pmod(xxhash64(band, bucket), n_parts) — the store's partition
    key. Hashing (band, bucket) jointly spreads every band's buckets over
    all partitions (band alone would give `bands` hot partitions)."""
    return F.pmod(F.xxhash64(band, bucket), F.lit(n_parts)).cast("int")


def read_store_pruned(spark: SparkSession, seen_dir: str,
                      bps: list[int]) -> DataFrame:
    """The store lookup, pruned to the given bp partitions. `bps` is
    control-plane metadata: at most STORE_PARTITIONS ints, collected from
    the (checkpointed, small) batch bucket table — never row data. The
    literal isin over the partition column becomes a static PartitionFilter
    (asserted in tests): orphan partitions' files are never opened."""
    return spark.read.parquet(seen_dir).where(
        F.col("bp").isin([int(b) for b in bps]))


def novel_against_store(batch: DataFrame, seen: DataFrame | None,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        buckets: DataFrame | None = None,
                        ) -> tuple[DataFrame, DataFrame]:
    """(novel_docs, their_buckets): docs not LSH-colliding with `seen` nor
    with an earlier (smaller-id) doc in the same batch. `buckets` lets the
    caller pass a precomputed (already checkpointed) bucket table so the
    partition-pruning bp collection and the gate share one computation.

    The bucket table is localCheckpoint'ed (not cached): it is read by both
    returned frames AND the caller appends to the store the seen-join
    reads — the same invalidation hazard as plans/pipeline.py; a checkpoint
    is immune and leaves nothing to unpersist per micro-batch."""
    if buckets is None:
        buckets = lsh_buckets(batch, id_col, text_col) \
            .localCheckpoint(eager=True)
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
                        max_files_per_trigger: int = 1,
                        store_partitions: int = STORE_PARTITIONS) -> None:
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
        # a compaction that died between its two swap renames left the
        # store in the trash dir — restore it before anything reads or
        # appends (appending first would strand the old buckets forever)
        from ..plans.maintenance import recover_store

        recover_store(seen_dir)
        n_parts = _resolve_store_partitions(seen_dir, store_partitions)
        buckets = (
            lsh_buckets(batch, id_col, text_col)
            .withColumn("bp", store_partition_expr(
                F.col("band"), F.col("bucket"), n_parts))
            .localCheckpoint(eager=True)
        )
        bps = [r["bp"] for r in buckets.select("bp").distinct().collect()]
        # a store dir that exists but holds only the meta file (crash
        # between meta write and first append) has nothing to read yet;
        # a dir with ROOT parquet files and no bp= partitions is a
        # pre-bp-layout (flat) store — treating it as empty would silently
        # re-admit every seen duplicate and then corrupt the layout by
        # appending partitions next to flat files, so reject it loudly
        # (same doctrine as the modulus-mismatch ValueError)
        entries = os.listdir(seen_dir) if os.path.isdir(seen_dir) else []
        has_bp = any(d.startswith("bp=") for d in entries)
        if not has_bp and any(f.endswith(".parquet") for f in entries):
            raise ValueError(
                f"LSH store at {seen_dir} has the legacy FLAT layout (root "
                "parquet files, no bp= partitions) — rewrite it into the "
                "partitioned layout (read, add bp via store_partition_expr, "
                "write partitionBy('bp'), write_store_meta) before resuming"
            )
        seen = read_store_pruned(sp, seen_dir, bps) if has_bp else None
        novel, nb = novel_against_store(batch, seen, id_col, text_col,
                                        buckets=buckets)
        # OUTPUT FIRST, store second: if the job dies between the writes, a
        # retry re-runs the batch against a store that does NOT yet contain
        # its own buckets, so the docs are re-emitted (at-least-once
        # duplicates in the sink — dedup by id downstream). The reverse
        # order would make a retried batch LSH-collide with itself and
        # silently drop every document.
        novel.write.mode("append").parquet(out_dir)
        write_store_meta(seen_dir, n_parts)  # idempotent; before first rows
        (nb.select("band", "bucket", "bp")
         .write.mode("append").partitionBy("bp").parquet(seen_dir))

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
