"""Input-parallelism guard for CPU-heavy operators (r7, guide §2.5).

Spark sizes scan and post-shuffle partitions by BYTES. Operators whose
per-row cost is dominated by expression CPU (gram folds, shingle
explodes, per-pair set intersections) can therefore land on a handful of
tasks when their input is byte-small — the pathological case being a
single unsplittable file (one parquet row group ⇒ ONE scan task no matter
what `maxPartitionBytes` says), where the whole operator runs
single-core while the rest of the cluster idles. Measured at sf0.1 on
local[32]: decontamination 3.0 → 0.6 s, curation funnel 4.3 → 1.5 s,
MinHash-LSH 2.7 → 1.5 s purely from spreading the scan.

`ensure_parallelism` repartitions ONLY when the input's planned partition
count is below the session's default parallelism — at warehouse scale a
corpus scan carries orders of magnitude more splits than the cluster has
cores, so the guard is a structural no-op there and the operator's
no-corpus-shuffle shape is preserved exactly where it matters. The one
regime where it fires on a big cluster is the same one it fires on here:
an input whose planned parallelism cannot feed the cluster (few
unsplittable files, a heavily-filtered coalesced intermediate) — the
case guide §2.5 says to repartition right after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin-spread `df` to `factor ×` the session's default
    parallelism iff its planned partition count is lower; otherwise the
    input is returned untouched. Keyless repartition is
    retry-deterministic (sort-before-repartition is on by default,
    SPARK-23207).

    The guard only ever probes EXCHANGE-FREE plans (scans, checkpoints,
    projections): under AQE, `df.rdd` on a plan containing a shuffle or
    broadcast MATERIALIZES those stages as real hidden jobs at
    plan-build time — and that work re-runs when the returned DataFrame
    actually executes (r7 review finding: the curate pipeline's probe
    re-ran the whole extraction scan). A plan that already contains an
    Exchange doesn't need this guard anyway: its post-shuffle width is
    AQE-governed (see session.py's minPartitionSize floor). For
    exchange-free plans `df.rdd` compiles without running a job, and the
    partition count it reports (file splits / checkpoint partitions) is
    exact."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            return df
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — un-plannable input (e.g. a
        return df      # streaming relation): leave untouched
    if current < target:
        return df.repartition(target)
    return df
