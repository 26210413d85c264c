#!/usr/bin/env python
"""Fixed-cost profile of the incremental dedup admit path (r6 verdict #7):
reproduces the bench's incremental_admit setup, then times the phases
separately — inner dedup_corpus(B), buckets build, store read + probe +
verify, appends — and counts store files (guide §6 small-files check).

Usage: python scripts/inc_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rag_pdf_parser_spark.operators.dedup import (  # noqa: E402
    dedup_corpus,
    dedup_corpus_incremental,
    lsh_buckets,
)
from rag_pdf_parser_spark.session import get_spark  # noqa: E402


def count_files(d: str) -> int:
    n = 0
    for _, _, files in os.walk(d):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    A = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    B = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    out: dict = {}

    base = tempfile.mkdtemp(prefix="incprof_")
    try:
        pris = os.path.join(base, "pris")
        os.makedirs(pris)
        t0 = time.time()
        dedup_corpus_incremental(A, os.path.join(pris, "idx"),
                                 os.path.join(pris, "canon"))
        out["seed_admit_sec"] = round(time.time() - t0, 3)
        out["store_files_after_seed"] = count_files(os.path.join(pris, "idx"))
        out["canon_files_after_seed"] = count_files(
            os.path.join(pris, "canon"))

        # phase A: inner dedup_corpus(B) alone (warm + timed)
        dedup_corpus(B).count()
        t0 = time.time()
        dedup_corpus(B).count()
        out["inner_dedup_corpus_sec"] = round(time.time() - t0, 3)

        # phase B: buckets build alone
        t0 = time.time()
        lsh_buckets(B, "doc_id", "text", 5, 32, 8, "xx", "char").count()
        out["buckets_sec"] = round(time.time() - t0, 3)

        # full admit, twice (warm-up then timed), pristine copy each time
        def run_once():
            work = os.path.join(base, f"w{time.time_ns()}")
            shutil.copytree(pris, work)
            t0 = time.time()
            dedup_corpus_incremental(B, os.path.join(work, "idx"),
                                     os.path.join(work, "canon")).count()
            dt = time.time() - t0
            nf = count_files(os.path.join(work, "idx"))
            shutil.rmtree(work)
            return dt, nf

        run_once()
        d1, nf = run_once()
        d2, _ = run_once()
        out["admit_sec"] = round(min(d1, d2), 3)
        out["admit_runs"] = [round(d1, 3), round(d2, 3)]
        out["store_files_after_admit"] = nf
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
