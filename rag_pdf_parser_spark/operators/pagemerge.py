"""Spark-native page-boundary merge + document re-assembly.

The reference merges page-boundary sentence splits by asking an LLM and
rewriting the markdown tail-first (page_merger.py:119-231). Relationally the
same dataflow is (SURVEY §2.3 J4 / §2.5 W7-W8):

    lead()/lag() over Window.partitionBy(doc_id).orderBy(reading_order)
    → per-block join decision (deterministic rule, kernel.pagemerge)
    → concat in order via array_sort(collect_list(struct(...)))

This module re-derives `extracted_text` PURELY with native expressions from
the flat blocks table, and is tested byte-identical to the kernel's
sequential `assemble_text` — the strongest demonstration that the relational
formulation matches the imperative one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The merge rule regexes (kernel.pagemerge twins).
_HYPHEN_TAIL = r"[A-Za-z0-9]-$"
_OPEN_TAIL = r"[a-z,;]$"
_LOWER_HEAD = r"^[a-z]"


def assemble_text_native(blocks: DataFrame) -> DataFrame:
    """blocks → (doc_id, url, extracted_text) via windows, no Python.

    Each block contributes `piece` = (separator decided against the PREVIOUS
    block) + (own text minus a trailing hyphen when merged with the NEXT
    block). Hyphen-drop is decided by lead(), separator by lag() — one
    window, two frames, then an order-preserving aggregate.
    """
    # empty-text blocks are invisible to the kernel's assembly loop
    # (htmlx.assemble_text skips them before updating prev_page) — filter
    # BEFORE the window so lag/lead see the same neighbors.
    blocks = blocks.where(F.col("text").isNotNull() & (F.length("text") > 0))
    w = Window.partitionBy("doc_id").orderBy("reading_order")
    prev_page = F.lag("page").over(w)
    prev_text = F.lag("text").over(w)
    next_page = F.lead("page").over(w)
    next_text = F.lead("text").over(w)

    boundary_prev = prev_page.isNotNull() & (F.col("page") == prev_page + 1)
    boundary_next = next_page.isNotNull() & (next_page == F.col("page") + 1)

    # merge kind vs previous block (decides my separator)
    prev_hyphen = boundary_prev & prev_text.rlike(_HYPHEN_TAIL)
    prev_space = (
        boundary_prev
        & ~prev_text.rlike(_HYPHEN_TAIL)
        & prev_text.rlike(_OPEN_TAIL)
        & F.col("text").rlike(_LOWER_HEAD)
    )
    sep = (
        F.when(prev_text.isNull(), F.lit(""))
        .when(prev_hyphen, F.lit(""))
        .when(prev_space, F.lit(" "))
        .otherwise(F.lit("\n\n"))
    )

    # hyphen-drop vs next block (next's sep will be '')
    next_hyphen = (
        boundary_next
        & F.col("text").rlike(_HYPHEN_TAIL)
        & next_text.isNotNull()
        & (F.length(next_text) > 0)
    )
    body = F.when(
        next_hyphen, F.expr("substring(text, 1, length(text) - 1)")
    ).otherwise(F.col("text"))

    pieces = blocks.select(
        "url",
        "doc_id",
        F.col("reading_order").alias("ro"),
        F.concat(sep, body).alias("piece"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("ro", "piece"))),
        lambda s: s["piece"],
    )
    return pieces.groupBy("doc_id").agg(
        F.first("url").alias("url"),
        F.array_join(ordered, "").alias("extracted_text"),
    )


def render_markdown_doc(blocks: DataFrame) -> DataFrame:
    """K1 sink: one markdown document per doc_id with page separators
    '---\\n<!-- Page N -->' between pages (writer.py:80-87 semantics)."""
    w_page_first = (
        F.col("reading_order")
        == F.min("reading_order").over(
            Window.partitionBy("doc_id", "page")
        )
    )
    pieces = blocks.where(F.length("markdown") > 0).select(
        "doc_id",
        F.col("reading_order").alias("ro"),
        F.concat(
            F.when(
                w_page_first & (F.col("page") > 1),
                F.format_string("\n---\n<!-- Page %d -->\n\n", F.col("page")),
            ).otherwise(F.when(F.col("reading_order") > 0, F.lit("\n\n")).otherwise(F.lit(""))),
            F.col("markdown"),
        ).alias("piece"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("ro", "piece"))),
        lambda s: s["piece"],
    )
    return pieces.groupBy("doc_id").agg(
        F.array_join(ordered, "").alias("markdown_doc")
    )
