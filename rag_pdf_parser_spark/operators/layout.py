"""Layout-lane operators: XY-cut reading order and markdown segmentation.

These wrap the two remaining per-document kernels (W3 sort_boxes, X7
segment_markdown) as Arrow-vectorized stages — the PDF-lane slots of the
north star (positioned text boxes stand in for pdfminer output; the markdown
lane handles already-linearized text inputs like the `documents` table).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.layout import sort_boxes
from ..kernel.mdseg import segment_markdown

BOXES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("page_width", T.DoubleType(), False),
    T.StructField("line_id", T.IntegerType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("box", T.ArrayType(T.DoubleType()), False),
])

ORDERED_SCHEMA = T.StructType(
    BOXES_SCHEMA.fields + [T.StructField("reading_order", T.IntegerType(), False)]
)

MD_BLOCKS_SCHEMA = (
    "doc_id long, reading_order int, type string, text string, markdown string"
)


def xy_cut_order(boxes: DataFrame) -> DataFrame:
    """Assign reading order per doc via the column-aware XY sort (kernel
    twin of extractor.py:304-356). Grouped map per doc_id — reading order is
    a per-document total order, inherently sequential per doc and parallel
    across docs."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        width = float(pdf["page_width"].iloc[0])
        lines = [
            {"line_id": int(r.line_id), "text": r.text,
             "box": list(r.box)}
            for r in pdf.itertuples()
        ]
        ordered = sort_boxes(lines, width)
        rank = {l["line_id"]: i for i, l in enumerate(ordered)}
        pdf = pdf.copy()
        pdf["reading_order"] = pdf["line_id"].map(rank).astype("int32")
        return pdf

    return boxes.groupBy("doc_id").applyInPandas(per_doc, ORDERED_SCHEMA)


def segment_markdown_docs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """X7 as a mapInPandas stage over any text/markdown column — emits the
    flat typed-block table."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for b in segment_markdown(text or ""):
                    rows.append((int(did), b["reading_order"], b["type"],
                                 b["text"], b["markdown"]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "reading_order", "type", "text", "markdown"],
            )

    n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        docs.select(id_col, text_col)
        .repartition(n, F.xxhash64(F.col(id_col)))
        .mapInPandas(run, MD_BLOCKS_SCHEMA)
    )


def synth_boxes(spark, n_docs: int, seed: int = 42) -> DataFrame:
    """Deterministic positioned-boxes fixture, distributed generation."""
    from ..kernel.layout import make_boxes

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                lines, width = make_boxes(int(i), seed)
                for l in lines:
                    box = l["box"]
                    rows.append((int(i), width, l["line_id"], l["text"],
                                 [float(x) for x in box]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page_width", "line_id", "text", "box"]
            )

    return spark.range(n_docs).mapInPandas(gen, BOXES_SCHEMA)
