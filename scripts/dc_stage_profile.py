#!/usr/bin/env python
"""Fine-grained wall-clock breakdown of dedup_corpus at current defaults,
with partition counts at each materialization point (r7: the parallelism-
collapse investigation — single-file scans + AQE byte-based coalescing
leave CPU-heavy stages on ~1 task at sf0.1)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rag_pdf_parser_spark.operators.dedup import (  # noqa: E402
    connected_components,
    dedup_keep_canonical,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)
from rag_pdf_parser_spark.session import get_spark  # noqa: E402

T = 0.8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    out: dict = {}
    # warm
    spark.range(1 << 20).select(F.sum("id")).collect()
    for _ in range(2):
        run_pass(spark, docs, out)
    print(json.dumps(out))


def run_pass(spark, docs, out: dict) -> None:
    def rec(k, v):
        out.setdefault(k, []).append(v)

    n_spread = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    ded = exact_dedup(docs, "text", "doc_id").drop("content_sha") \
        .repartition(n_spread, "doc_id") \
        .localCheckpoint(eager=True)
    rec("exact_dedup_sec", round(time.time() - t0, 3))

    t0 = time.time()
    cands = lsh_candidate_pairs(ded, id_col="doc_id", num_perm=32, bands=8,
                                max_bucket=10_000).localCheckpoint(eager=True)
    rec("cands_sec", round(time.time() - t0, 3))

    t0 = time.time()
    verified = ngram_jaccard_pairs(ded, cands, id_col="doc_id",
                                   min_jaccard=T) \
        .where(F.col("jaccard") >= T).select("id_a", "id_b") \
        .localCheckpoint(eager=True)
    rec("verify_sec", round(time.time() - t0, 3))
    rec("n_true", verified.count())

    t0 = time.time()
    comp = connected_components(verified, "id_a", "id_b")
    comp.count()
    rec("cc_sec", round(time.time() - t0, 3))

    t0 = time.time()
    dedup_keep_canonical(ded, verified, "doc_id").count()
    rec("keep_canonical_sec", round(time.time() - t0, 3))


if __name__ == "__main__":
    main()
