#!/usr/bin/env python
"""Stage profile for the one-call `dedup_corpus` recipe (r6 retune
evidence): recall-first (8,4) vs precision-first (32,8) banding, verify
with vs without the exact size-bound prefilter, over the sf documents
table. Prints one JSON line; the numbers back BENCH.md "dedup_corpus
stage profile".

The two configs must find the IDENTICAL true-pair set at the 0.8
threshold (asserted) — the retune trades banding collisions, never
recall.

Usage: python scripts/dedup_profile.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rag_pdf_parser_spark.operators.dedup import (  # noqa: E402
    dedup_corpus,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
)
from rag_pdf_parser_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").localCheckpoint(eager=True))
    out: dict = {"n_docs": docs.count(), "sf_dir": sf_dir}

    true_sets = {}
    for tag, (num_perm, bands) in (("old", (8, 4)), ("new", (32, 8))):
        t0 = time.time()
        minhash_signature(docs, num_perm=num_perm).count()
        out[f"signature_sec_{tag}"] = round(time.time() - t0, 3)
        cands = lsh_candidate_pairs(docs, num_perm=num_perm, bands=bands,
                                    max_bucket=10_000) \
            .localCheckpoint(eager=True)
        out[f"candidates_{tag}"] = cands.count()

        t0 = time.time()
        v = ngram_jaccard_pairs(docs, cands).localCheckpoint(eager=True)
        true_sets[tag] = {(r["id_a"], r["id_b"]) for r in
                          v.where(F.col("jaccard") >= THRESHOLD).collect()}
        out[f"verify_noprefilter_sec_{tag}"] = round(time.time() - t0, 3)
        out[f"true_pairs_{tag}"] = len(true_sets[tag])
        out[f"cands_below_03_{tag}"] = v.where(F.col("jaccard") < 0.3).count()

        t0 = time.time()
        n_true_pre = (ngram_jaccard_pairs(docs, cands,
                                          min_jaccard=THRESHOLD)
                      .where(F.col("jaccard") >= THRESHOLD).count())
        out[f"verify_prefilter_sec_{tag}"] = round(time.time() - t0, 3)
        assert n_true_pre == out[f"true_pairs_{tag}"], \
            (n_true_pre, out[f"true_pairs_{tag}"])
        out[f"bound_survivors_{tag}"] = ngram_jaccard_pairs(
            docs, cands, min_jaccard=THRESHOLD).count()

    assert true_sets["old"] == true_sets["new"], \
        "banding retune changed the exact true-pair set"

    for tag, kw in (("old", {"num_perm": 8, "bands": 4}), ("new", {})):
        t0 = time.time()
        dedup_corpus(docs, **kw).count()
        out[f"e2e_sec_{tag}"] = round(time.time() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
