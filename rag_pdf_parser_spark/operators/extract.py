"""Extraction stage: pages → documents(blocks nested) → blocks (exploded).

Spark-first layout of the reference's per-file loop (SURVEY §3.1):
the entire per-document pipeline (charset decode → DOM parse → boilerplate
strip → typed blocks → reading order → markdown → page-merge assembly) runs
inside ONE `mapInArrow` stage calling the pure-Python kernel
(`rag_pdf_parser_spark.kernel.htmlx.extract_document`) per row of each Arrow
batch — per-document imperative work is the one thing Spark built-ins cannot
express (reference analog: ir_processor.py:96-264), and batching it through
Arrow amortizes all serde.

Scale design:
- **skew defusal**: upstream `repartition(n, xxhash64(url))` spreads hot
  hosts uniformly (north_rule; a host's pages share templates and can be
  enormous) — the extraction cost is per-row, so uniform row spread = uniform
  work;
- per-row size cap inside the kernel (MAX_HTML_BYTES, OVERSIZE_TRUNCATED
  failure code) bounds worst-case memory per task;
- everything downstream of this stage is native Spark (no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.types import to_arrow_type

from ..kernel.chunker import chunk_blocks
from ..kernel.htmlx import extract_document
from ..schema import DOCS_FULL_SCHEMA, DOCS_SCHEMA

_DOC_COLS = [f.name for f in DOCS_SCHEMA.fields]
_CHUNK_FIELDS = [f.name for f in DOCS_FULL_SCHEMA["chunks"].dataType.elementType.fields]

# Arrow twins of the output StructTypes, built once at import: the Arrow
# stage yields RecordBatches directly (r7 — mapInPandas paid an extra
# pandas round-trip per batch on both sides of the boundary; building the
# pyarrow arrays ourselves measured 2.45 → 2.0 s on the 50k-page
# extraction headline with byte-identical output, guide §4.2).
_DOCS_ARROW = pa.schema(
    [pa.field(f.name, to_arrow_type(f.dataType)) for f in DOCS_SCHEMA.fields])
_DOCS_FULL_ARROW = pa.schema(
    [pa.field(f.name, to_arrow_type(f.dataType))
     for f in DOCS_FULL_SCHEMA.fields])


def _append_doc_cols(cols: dict[str, list], url, raw: bytes, d: dict) -> None:
    """Shared per-row column fill for both Arrow extraction stages (the
    fused variant adds only `chunks` on top)."""
    cols["url"].append(url)
    cols["doc_id"].append(d["doc_id"])
    cols["charset"].append(d["charset"])
    cols["failure_code"].append(d["failure_code"])
    cols["title"].append(d["title"])
    cols["authors"].append(d["authors"])
    cols["parser_version"].append(d["parser_version"])
    cols["n_pages"].append(d["n_pages"])
    cols["extracted_text"].append(d["extracted_text"])
    cols["bytes_in"].append(len(raw))
    cols["blocks"].append(d["blocks"])


def _extract_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        urls = batch.column(batch.schema.get_field_index("url")).to_pylist()
        htmls = batch.column(batch.schema.get_field_index("html")).to_pylist()
        cols: dict[str, list] = {k: [] for k in _DOC_COLS}
        for url, html in zip(urls, htmls):
            raw = bytes(html) if html is not None else b""
            _append_doc_cols(cols, url, raw, extract_document(raw))
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _DOCS_ARROW],
            schema=_DOCS_ARROW)


def extract_docs(pages: DataFrame, partitions: int | None = None,
                 salt: bool = True) -> DataFrame:
    """pages(url, html, ...) → docs per DOCS_SCHEMA (blocks nested).

    `partitions`: salted-repartition width before the UDF; defaults to
    3× the session's shuffle partitions (UDF stages want finer tasks than
    pure-JVM stages: stragglers from uneven per-document cost are the
    dominant tail at high parallelism).

    `salt=False` skips the defusal shuffle — correct when the input is
    already url-hash bucketed (an Iceberg table bucketed at ingest), which
    is the production layout at 10^12 rows.
    """
    src = pages.select("url", "html")
    if salt:
        n = partitions or 3 * int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        src = src.repartition(n, F.xxhash64("url"))
    return src.mapInArrow(_extract_batches, DOCS_SCHEMA)


def _extract_full_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    full_cols = _DOC_COLS + ["chunks"]
    for batch in it:
        urls = batch.column(batch.schema.get_field_index("url")).to_pylist()
        htmls = batch.column(batch.schema.get_field_index("html")).to_pylist()
        cols: dict[str, list] = {k: [] for k in full_cols}
        for url, html in zip(urls, htmls):
            raw = bytes(html) if html is not None else b""
            d = extract_document(raw)
            _append_doc_cols(cols, url, raw, d)
            cols["chunks"].append([
                {k: c[k] for k in _CHUNK_FIELDS}
                for c in chunk_blocks(d["blocks"], d["doc_id"])
            ])
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _DOCS_FULL_ARROW],
            schema=_DOCS_FULL_ARROW)


def extract_docs_full(pages: DataFrame, partitions: int | None = None,
                      salt: bool = True) -> DataFrame:
    """Fused extraction + chunking in ONE Arrow stage (blocks and chunks both
    nested). Chunking is per-doc sequential (SURVEY §2.5 W6), so fusing it
    into the extraction pass costs nothing and removes the groupBy(doc_id)
    shuffle + per-group pandas overhead of the standalone grouped-map —
    the right plan shape at 10^12 docs. Use `chunk_documents` only when
    chunking pre-existing block tables.

    `salt=False` skips the defusal repartition (same contract as
    `extract_docs`): correct when the input is already url-hash bucketed at
    ingest — re-shuffling an already-bucketed 10^12-row corpus is pure waste.
    """
    src = pages.select("url", "html")
    if salt:
        # Same 3× default as extract_docs (r3 verdict #7 unification): the
        # fused stage is MORE straggler-prone, not less — chunking adds
        # per-doc cost on top of extraction, so uneven per-document work
        # dominates the tail and finer tasks amortize it. Measured at sf0.1
        # local[32] (salted, min-of-2 warm): 1× = 5.96 s, 3× = 4.71 s.
        n = partitions or 3 * int(
            pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        src = src.repartition(n, F.xxhash64("url"))
    return src.mapInArrow(_extract_full_batches, DOCS_FULL_SCHEMA)


def explode_chunks(docs_full: DataFrame) -> DataFrame:
    """docs_full → flat chunks table (CHUNKS_SCHEMA shape)."""
    return (
        docs_full.select("doc_id", F.explode("chunks").alias("c"))
        .select("c.chunk_id", "doc_id", "c.page_start", "c.page_end",
                "c.block_ids", "c.section", "c.text", "c.token_count",
                "c.char_count", "c.reading_order_start",
                "c.reading_order_end", "c.anchors", "c.embedding")
    )


def explode_blocks(docs: DataFrame) -> DataFrame:
    """docs → flat blocks table keyed (doc_id, page, block_id) — the
    reference's IRBlock list materialized relationally (SURVEY §2.1 S3)."""
    return (
        docs.select("url", "doc_id", F.explode("blocks").alias("b"))
        .select("url", "doc_id", "b.*")
    )
