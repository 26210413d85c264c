"""MERGE-equivalent maintenance for the mutable stores (r3 verdict #3).

The engine's two long-lived mutable tables are bare parquet appends:

- ``seen_hashes`` (operators/dedup.py register_hashes — the reference's
  SQLite upsert, persistent.py:158-190, as a table), and
- the streaming LSH bucket store (streaming/minhash.py).

Appends accumulate duplicate rows (harmless for correctness — both lookups
are semi-joins — but scan cost grows without bound). SURVEY §1.1 maps these
to Delta/Iceberg tables whose MERGE/rewriteDataFiles would compact them;
Iceberg jars are absent in this sandbox, so `compact_table` implements the
same job: read → dropDuplicates → rewrite → ATOMIC SWAP.

Swap protocol (commit = one POSIX dir rename, same primitive as the
pipeline's manifest commit):

    1. write the compacted table to  <path>.__compact_tmp
    2. rename <path>            →  <path>.__compact_trash
    3. rename <path>.__compact_tmp → <path>                ← COMMIT
    4. rmtree  <path>.__compact_trash

A crash between (2) and (3) leaves the store briefly ABSENT — readers must
call `recover_store` first (it undoes a half-finished swap by renaming the
trash back). On a real deployment the whole dance is a single Iceberg
metadata swap; this module documents and tests the exact same commit
semantics on plain dirs.

Writer exclusion is ENFORCED, not assumed (r4 verdict #9): every compact_*
acquires the same `plans.lease.WriterLease` on the store's parent dir that
`ExtractionPipeline.run` takes on its out_dir — a compaction racing a live
pipeline (or another compaction) raises LeaseHeldError instead of swapping
files out from under it. The one unleased writer is the streaming LSH
query (a single long-lived query by construction): stopping the stream IS
its maintenance window, documented in streaming/minhash.py.

`compact_output` extends the same two-rename commit to the pipeline's
MANIFEST (r4 verdict #7): committed batches are folded into one base
batch — content sinks first (appended UNCOMMITTED under the new base
batch_id, invisible), then the manifest dir is atomically swapped to a
commit log containing only the base batch, then the now-orphaned old
content partitions are vacuumed under the held lease. Readers see the old
batches right up to the manifest swap and exactly the base batch after
it; a crash at any rename is recovered by `recover_store`, which the
pipeline calls at every committed-read entry point.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lease import WriterLease


def _tmp(path: str) -> str:
    return path.rstrip("/") + ".__compact_tmp"


def _trash(path: str) -> str:
    return path.rstrip("/") + ".__compact_trash"


def recover_store(path: str) -> bool:
    """Undo a swap that died between the two renames (store dir missing,
    trash present): the old store is intact in the trash — rename it back.
    Idempotent; returns True when a recovery happened. Call before reading
    a store that a crashed compaction may have left half-swapped."""
    if not os.path.exists(path) and os.path.exists(_trash(path)):
        os.rename(_trash(path), path)
        return True
    return False


def atomic_swap(path: str) -> None:
    """Publish <path>.__compact_tmp as <path> (steps 2-4 above)."""
    if os.path.exists(_trash(path)):  # leftover from an earlier crash
        shutil.rmtree(_trash(path))
    os.rename(path, _trash(path))
    os.rename(_tmp(path), path)
    shutil.rmtree(_trash(path))


def compact_table(spark: SparkSession, path: str,
                  dedup_keys: list[str],
                  partition_by: list[str] | None = None,
                  target_files_per_partition: int = 1,
                  preserve_files: list[str] | None = None,
                  lease_stale_sec: float = 3600.0) -> dict:
    """Rewrite the parquet table at `path` with duplicate rows (by
    `dedup_keys`) collapsed and small append files coalesced — the
    MERGE-maintenance job. Preserves (or re-establishes) the
    `partition_by` layout so downstream partition pruning keeps working.
    Holds the parent-dir writer lease for the duration (module docstring).

    Returns {"rows_before", "rows_after", "files_before", "files_after"}.
    """
    with WriterLease(os.path.dirname(path.rstrip("/")) or ".",
                     lease_stale_sec) as lease:
        return _compact_table_locked(spark, path, dedup_keys, partition_by,
                                     target_files_per_partition,
                                     preserve_files, lease)


def _compact_table_locked(spark: SparkSession, path: str,
                          dedup_keys: list[str],
                          partition_by: list[str] | None = None,
                          target_files_per_partition: int = 1,
                          preserve_files: list[str] | None = None,
                          lease: WriterLease | None = None) -> dict:
    recover_store(path)
    df = spark.read.parquet(path)
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path))
    rows_before = df.count()
    compacted = df.dropDuplicates(dedup_keys)
    if partition_by:
        # one output file per partition dir (small dimension stores); at
        # real scale tune target_files_per_partition to executor-sized files
        compacted = compacted.repartition(
            target_files_per_partition * max(
                1, compacted.select(*partition_by).distinct().count()),
            *partition_by)
        writer = compacted.write.mode("overwrite").partitionBy(*partition_by)
    else:
        writer = compacted.coalesce(target_files_per_partition) \
            .write.mode("overwrite")
    # the tmp write is an ACTION that completes before any rename below —
    # the source read and the swap never overlap
    writer.parquet(_tmp(path))
    # sidecar metadata (e.g. the LSH store's persisted bp modulus) must
    # TRAVEL WITH the commit rename — copying it after the swap would leave
    # a metadata-less store if the process dies in between (reopening the
    # exact silent-mismatch hole the metadata exists to close)
    for name in preserve_files or []:
        src = os.path.join(path, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(_tmp(path), name))
    if lease is not None:
        # commit-point validation (same rule as pipeline._run): a long
        # compaction whose lock went stale and was stolen must abort HERE
        # — swapping would discard rows the stealing writer appended to
        # the store after our read. touch() first so a healthy compaction
        # never looks stale to the next acquirer.
        lease.assert_held()
        lease.touch()
    atomic_swap(path)
    out = spark.read.parquet(path)
    files_after = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path))
    return {"rows_before": rows_before, "rows_after": out.count(),
            "files_before": files_before, "files_after": files_after}


def compact_seen_hashes(spark: SparkSession, path: str) -> dict:
    """seen_hashes maintenance: one row per (hash, kind) — the reference's
    INSERT OR IGNORE upsert semantics (persistent.py:158-190) re-established
    over the append-only log."""
    return compact_table(spark, path, ["hash", "kind"])


def compact_output(spark: SparkSession, out_dir: str,
                   fmt: str = "parquet",
                   lease_stale_sec: float = 3600.0) -> dict:
    """Fold an ExtractionPipeline out_dir's committed ``batch_id=`` batches
    into ONE base batch — manifest maintenance (r4 verdict #7). The commit
    log grows a dir per run forever; after thousands of runs the listing
    and the per-sink small-file count dominate. Protocol, under the held
    writer lease (no run can start or commit while it proceeds):

        1. read committed rows of each content sink, append them under
           ``batch_id=base-<token>``   — UNCOMMITTED, invisible to readers
        2. write the committed manifest rows to manifest.__compact_tmp as
           the single partition ``batch_id=base-<token>``
        3. atomic_swap(manifest)       ← COMMIT: the log now lists exactly
           the base batch, whose content rows are the same rows
        4. vacuum the now-orphaned old content partitions (age 0 is safe:
           the lease guarantees no writer is in flight)

    Crash anywhere before (3): extra uncommitted base partitions that the
    age-guarded vacuum reclaims — state is the pre-compaction one. Crash
    between the two renames inside (3): `recover_store` (called by every
    pipeline committed-read entry point) restores the old manifest. Crash
    after (3): committed state is the base batch; orphans age out.

    Readers therefore see the pre-compaction batches up to the instant of
    the swap and exactly-equal rows after it. Returns
    {"batches_before", "batches_after", "removed_dirs"}.
    """
    from .pipeline import ExtractionPipeline

    p = ExtractionPipeline(spark, out_dir)
    with WriterLease(out_dir, lease_stale_sec) as lease:
        ids = p.committed_batch_ids()
        if len(ids) <= 1:
            return {"batches_before": len(ids), "batches_after": len(ids),
                    "removed_dirs": 0}
        base = f"base-{uuid.uuid4().hex[:12]}"
        for sink in (p.docs_path, p.blocks_path, p.chunks_path):
            if not os.path.isdir(sink):
                continue
            rows = (spark.read.format(fmt).load(sink)
                    .where(F.col("batch_id").isin(ids))
                    .withColumn("batch_id", F.lit(base)))
            (rows.write.mode("append").partitionBy("batch_id")
             .format(fmt).save(sink))
        manifest = (spark.read.parquet(p.manifest_path)
                    .where(F.col("batch_id").isin(ids))
                    .withColumn("batch_id", F.lit(base)))
        tmp = _tmp(p.manifest_path)
        if os.path.exists(tmp):  # leftover from an earlier crash
            shutil.rmtree(tmp)
        manifest.write.partitionBy("batch_id").parquet(tmp)
        # commit-point validation: the content fold above can run long; if
        # the lock went stale and a pipeline run stole it and COMMITTED a
        # new batch, swapping our pre-steal commit log would erase that
        # batch's manifest entry and the vacuum below would delete its
        # content — silent loss of a committed batch. Abort instead.
        lease.assert_held()
        lease.touch()
        atomic_swap(p.manifest_path)
        removed = p.vacuum_uncommitted(0)
        return {"batches_before": len(ids), "batches_after": 1,
                "removed_dirs": removed}


def compact_lsh_store(spark: SparkSession, path: str) -> dict:
    """STREAMING LSH bucket store maintenance: one row per (band, bucket),
    bp partition layout preserved for micro-batch pruning. The store's
    _STORE_META.json (the persisted bp modulus — streaming/minhash.py)
    rides the atomic swap via `preserve_files` — bp values are preserved
    verbatim, so the modulus they were computed with must be too, through
    every crash point.

    REFUSES id-bearing stores (the batch-incremental index,
    operators/dedup.py dedup_corpus_incremental): its rows carry an OWNER
    id, and two canonical docs legitimately share a bucket below the
    Jaccard threshold — deduping by (band, bucket) would keep one
    arbitrary owner, and every future near-dup of the dropped owner would
    probe, miss, and be admitted forever (silent loss, r5 verdict #1).
    Use `compact_batch_lsh_store` for that store.

    The recover + schema read happen INSIDE the leased section (review
    finding): an un-leased recover_store here could resurrect the trash
    dir of a CONCURRENT compaction sitting between its two swap renames,
    making that compaction's second rename collide mid-commit."""
    from ..streaming.minhash import _META_NAME

    with WriterLease(os.path.dirname(path.rstrip("/")) or ".",
                     3600.0) as lease:
        recover_store(path)
        if "id" in spark.read.parquet(path).schema.fieldNames():
            raise ValueError(
                f"LSH store at {path} carries an owner `id` column — this "
                "is the batch-incremental index, and collapsing it to one "
                "row per (band, bucket) would drop legitimate co-bucketed "
                "owners and silently re-admit their future "
                "near-duplicates. Run compact_batch_lsh_store instead.")
        return _compact_table_locked(spark, path, ["band", "bucket"],
                                     partition_by=["bp"],
                                     preserve_files=[_META_NAME],
                                     lease=lease)


def compact_batch_lsh_store(spark: SparkSession, path: str) -> dict:
    """BATCH-incremental LSH index maintenance (the id-bearing store
    `dedup_corpus_incremental` appends to): one row per (band, bucket, id)
    — the owner id is part of the identity, so co-bucketed canonical owners
    all survive and keep rejecting their future near-dups. bp layout and
    _STORE_META.json (bp modulus + signature config) ride the swap exactly
    as in `compact_lsh_store`. What gets reclaimed: duplicate rows from
    crashed-and-retried appends, and the per-increment small files."""
    from ..streaming.minhash import _META_NAME

    return compact_table(spark, path, ["band", "bucket", "id"],
                         partition_by=["bp"], preserve_files=[_META_NAME])
