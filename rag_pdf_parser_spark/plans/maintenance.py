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
semantics on plain dirs. Run compaction in the maintenance window, not
concurrently with writers (same rule as Iceberg rewriteDataFiles without
a metastore lock).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


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
                  preserve_files: list[str] | None = None) -> dict:
    """Rewrite the parquet table at `path` with duplicate rows (by
    `dedup_keys`) collapsed and small append files coalesced — the
    MERGE-maintenance job. Preserves (or re-establishes) the
    `partition_by` layout so downstream partition pruning keeps working.

    Returns {"rows_before", "rows_after", "files_before", "files_after"}.
    """
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


def compact_lsh_store(spark: SparkSession, path: str) -> dict:
    """Streaming LSH bucket store maintenance: one row per (band, bucket),
    bp partition layout preserved for micro-batch pruning. The store's
    _STORE_META.json (the persisted bp modulus — streaming/minhash.py)
    rides the atomic swap via `preserve_files` — bp values are preserved
    verbatim, so the modulus they were computed with must be too, through
    every crash point."""
    from ..streaming.minhash import _META_NAME

    return compact_table(spark, path, ["band", "bucket"],
                         partition_by=["bp"], preserve_files=[_META_NAME])
