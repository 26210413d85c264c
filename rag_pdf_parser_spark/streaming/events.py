"""Streaming operators over the `events` table.

The reference is strictly batch (SURVEY §2.10); its nearest streaming analog
is resume-by-status ≈ `availableNow` + checkpoint. These operators provide
the idiomatic Structured Streaming slots: watermarked tumbling-window
aggregation and an incremental extraction micro-batch.

Both have batch twins (same transformations on a static DataFrame) so the
DuckDB oracle can verify the aggregation logic; the streaming tests verify
that the streaming execution produces the same rows as the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).
    Works identically on a static or streaming DataFrame."""
    # parquet ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP (session tz is
    # pinned UTC so the cast is value-preserving)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "1 hour")
        if events.isStreaming
        else events
    ).groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def run_stream_once(spark: SparkSession, src_parquet: str, schema,
                    checkpoint: str, query_name: str = "hourly") -> DataFrame:
    """Drive the streaming aggregation over a static parquet dir with
    availableNow semantics (processAllAvailable), collecting to a memory
    sink — the local-mode harness for streaming correctness tests."""
    stream = (
        spark.readStream.schema(schema).parquet(src_parquet)
    )
    agg = hourly_event_stats(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
