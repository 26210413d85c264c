"""End-to-end corpus curation — the composed training-data pipeline a
100-TB user actually runs, built from the engine's tested gates:

    URL/domain gate        (operators.urlfilter — before touching text)
  → Gopher word gate       (functions.gopher_features_expr)
  → repetition gate        (functions.with_repetition_features)
  → model quality gate     (functions.with_quality_model)
  → near-dedup             (operators.dedup.dedup_corpus)

The text gates (gopher/repetition/model) contribute their boolean columns
in ONE projection pass over the corpus — zero shuffle, zero extra scans.
The URL gate, when a blocklist is supplied, adds its documented shape on
top: a second scan of the url column for the suffix-chain explode, a
broadcast semi-join against the blocklist, and a distinct+join back
(operators/urlfilter.py) — small next to the text work, but NOT free;
size shuffle capacity for it at 100 TB. The funnel report aggregates drop
counts per stage from the flags in one job; dedup shuffles per its own
documented shapes. The reference has no corpus curation at all — this is
the §2.11 engine-added capstone composing its per-stage analogs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    gopher_features_expr,
    with_quality_model,
    with_repetition_features,
)
from ..operators.dedup import dedup_corpus
from ..operators.urlfilter import filter_urls


def flag_corpus(docs: DataFrame, blocked_hosts: DataFrame | None = None,
                url_col: str = "url", text_col: str = "text") -> DataFrame:
    """docs + the four gate flags (url_ok, gopher_keep, repetition_keep,
    model_keep) + pass_all. Nothing is dropped — the auditable form (a
    manifest can record WHY each doc would fall); `curate_corpus` applies
    the drops."""
    out = docs
    if url_col in docs.columns:
        out = filter_urls(out, blocked_hosts, url_col=url_col) \
            .withColumn("url_ok", ~F.col("url_blocked")) \
            .drop("url_blocked", "block_reason")
    else:
        out = out.withColumn("url_ok", F.lit(True))
    # NULL text behaves as empty here like in every other gate — a NULL
    # gopher_keep would poison pass_all to NULL (doc vanishes from every
    # funnel bucket and from both curate branches)
    gf = gopher_features_expr(F.coalesce(F.col(text_col), F.lit("")))
    out = out.withColumn("gopher_keep", gf["gopher_keep"])
    out = with_repetition_features(out, text_col)
    out = with_quality_model(out, text_col)
    return out.withColumn(
        "pass_all",
        F.col("url_ok") & F.col("gopher_keep") & F.col("repetition_keep")
        & F.col("model_keep"),
    )


def curation_funnel(flagged: DataFrame) -> dict:
    """Per-stage drop accounting over a `flag_corpus` output — ONE
    aggregation job (control-plane scalars only). Stages are counted
    sequentially (a doc dropped by the URL gate isn't re-counted by later
    gates), matching how `curate_corpus` actually filters."""
    # coalesce: F.sum over ZERO rows is NULL — an empty corpus (or slice)
    # must report an all-zero funnel, not crash on int(None)
    c = lambda col: F.coalesce(  # noqa: E731
        F.sum(col.cast("long")), F.lit(0))
    u = F.col("url_ok")
    g = F.col("gopher_keep")
    r = F.col("repetition_keep")
    m = F.col("model_keep")
    row = flagged.agg(
        F.count("*").alias("n_input"),
        c(~u).alias("drop_url"),
        c(u & ~g).alias("drop_gopher"),
        c(u & g & ~r).alias("drop_repetition"),
        c(u & g & r & ~m).alias("drop_model"),
        c(u & g & r & m).alias("n_pass"),
    ).collect()[0]
    return {k: int(row[k]) for k in row.asDict()}


def curate_corpus(docs: DataFrame, blocked_hosts: DataFrame | None = None,
                  id_col: str = "doc_id", url_col: str = "url",
                  text_col: str = "text", dedup: bool = True,
                  jaccard_threshold: float = 0.8) -> DataFrame:
    """The full curation: gate flags → filter to pass_all → near-dedup.
    Returns the curated corpus with the original columns."""
    flagged = flag_corpus(docs, blocked_hosts, url_col, text_col)
    kept = flagged.where(F.col("pass_all")).select(*docs.columns)
    if not dedup:
        return kept
    return dedup_corpus(kept, id_col=id_col, text_col=text_col,
                        jaccard_threshold=jaccard_threshold)
