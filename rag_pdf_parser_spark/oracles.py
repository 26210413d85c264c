"""Driver-visible oracles for the non-relational query families.

Two oracle styles, both returning plain ANSI SQL the driver runs on DuckDB:

1. **Independent SQL twins** — the whole computation re-expressed in DuckDB
   SQL (random-hyperplane ANN, IVF probe/re-rank, average-hash, markdown
   segmentation on constructed inputs). Nothing is copied from the Spark
   result; the two engines compute the answer independently.

2. **Kernel-golden VALUES oracles** — for pipelines whose per-document state
   machines SQL cannot express (HTML/PDF extraction, XY-cut recursion, the
   chunker, xxhash64 fast paths). The oracle SQL is a `VALUES` table computed
   at `oracle_sql()` time by the PURE-PYTHON kernel (and, for the xx-hash
   family, the independent `kernel.xxh`/`kernel.twins` reimplementation) in
   the DRIVER process. The driver then verifies that the distributed Spark
   run — executors, Arrow boundary, shuffles — reproduces the local kernel
   byte-for-byte. This is SURVEY §5.1's byte-identity golden strategy,
   promoted from pytest to the driver correctness gate.

All generators are deterministic (seeded datagen, pinned kernels) and cached.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache

SF_ORACLE_DIR = "/root/testdata/sf0.01"


# --- VALUES rendering --------------------------------------------------------

def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def values_sql(rows, cols: list[tuple[str, str]]) -> str:
    """rows + [(name, duckdb_type)] → `SELECT casts FROM (VALUES ...)`."""
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    if not rows:
        nulls = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {nulls} WHERE FALSE"
    vals = ",\n".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {casts} FROM (VALUES\n{vals}\n) AS t({names})"


# --- kernel goldens: extraction family over synthetic pages -------------------

@lru_cache(maxsize=4)
def _kernel_docs(n_pages: int):
    from .datagen import make_pages
    from .kernel.htmlx import extract_document

    return [(p["url"], extract_document(p["html"])) for p in make_pages(n_pages)]


def extract_pages_sql(n_pages: int = 300) -> str:
    rows = [
        (url, d["doc_id"], d["charset"], d["failure_code"],
         ",".join(d["authors"]), d["parser_version"], d["n_pages"],
         len(d["extracted_text"]), len(d["blocks"]))
        for url, d in _kernel_docs(n_pages)
    ]
    return values_sql(rows, [
        ("url", "VARCHAR"), ("doc_id", "VARCHAR"), ("charset", "VARCHAR"),
        ("failure_code", "VARCHAR"), ("authors_csv", "VARCHAR"),
        ("parser_version", "VARCHAR"), ("n_pages", "INTEGER"),
        ("n_chars", "INTEGER"), ("n_blocks", "INTEGER"),
    ])


def extract_blocks_sql(n_pages: int = 300) -> str:
    rows = [
        (url, d["doc_id"], b["block_id"], b["type"], b["reading_order"],
         b["caption"], b["lang"], b["span_start"], b["span_end"], b["anchor"],
         b["content_hash"])
        for url, d in _kernel_docs(n_pages)
        for b in d["blocks"]
    ]
    return values_sql(rows, [
        ("url", "VARCHAR"), ("doc_id", "VARCHAR"), ("block_id", "VARCHAR"),
        ("type", "VARCHAR"), ("reading_order", "INTEGER"),
        ("caption", "VARCHAR"), ("lang", "VARCHAR"),
        ("span_start", "BIGINT"), ("span_end", "BIGINT"),
        ("anchor", "VARCHAR"), ("content_hash", "VARCHAR"),
    ])


def chunking_sql(n_pages: int = 300) -> str:
    from .kernel.chunker import chunk_blocks

    rows = []
    for _url, d in _kernel_docs(n_pages):
        for c in chunk_blocks(d["blocks"], d["doc_id"]):
            rows.append((c["chunk_id"], c["doc_id"], c["page_start"],
                         c["page_end"], c["section"], c["token_count"],
                         c["char_count"], c["reading_order_start"],
                         c["reading_order_end"]))
    return values_sql(rows, [
        ("chunk_id", "VARCHAR"), ("doc_id", "VARCHAR"),
        ("page_start", "INTEGER"), ("page_end", "INTEGER"),
        ("section", "VARCHAR"), ("token_count", "INTEGER"),
        ("char_count", "INTEGER"), ("reading_order_start", "INTEGER"),
        ("reading_order_end", "INTEGER"),
    ])


def assemble_native_sql(n_pages: int = 300) -> str:
    # docs with zero (non-empty-text) blocks vanish in the groupBy — the
    # kernel twin skips them the same way
    rows = [
        (d["doc_id"], url,
         hashlib.md5(d["extracted_text"].encode("utf-8")).hexdigest(),
         len(d["extracted_text"]))
        for url, d in _kernel_docs(n_pages)
        if [b for b in d["blocks"] if b["text"]]
    ]
    return values_sql(rows, [
        ("doc_id", "VARCHAR"), ("url", "VARCHAR"),
        ("text_md5", "VARCHAR"), ("n_chars", "INTEGER"),
    ])


def block_line_spans_sql(n_pages: int = 300) -> str:
    """Per-doc invariants of the line-span sub-structure (ocr_lines analog):
    line counts and coverage — the per-line detail is pytest-checked."""
    rows = []
    for url, d in _kernel_docs(n_pages):
        if not d["blocks"]:
            continue
        n_lines = sum(len(b["lines"]) for b in d["blocks"])
        covered = sum(l["end"] - l["start"]
                      for b in d["blocks"] for l in b["lines"])
        max_end = max((l["end"] for b in d["blocks"] for l in b["lines"]),
                      default=0)
        rows.append((d["doc_id"], len(d["blocks"]), n_lines, covered, max_end))
    return values_sql(rows, [
        ("doc_id", "VARCHAR"), ("n_blocks", "INTEGER"), ("n_lines", "BIGINT"),
        ("covered_chars", "BIGINT"), ("max_line_end", "BIGINT"),
    ])


def xy_cut_order_sql(n_docs: int = 100, seed: int = 42) -> str:
    from .kernel.layout import make_boxes, sort_boxes

    rows = []
    for i in range(n_docs):
        lines, width = make_boxes(i, seed)
        ordered = sort_boxes(lines, width)
        for order, l in enumerate(ordered):
            rows.append((i, l["line_id"], order))
    return values_sql(rows, [
        ("doc_id", "BIGINT"), ("line_id", "INTEGER"),
        ("reading_order", "INTEGER"),
    ])


def chunk_provenance_sql(n_pages: int = 100) -> str:
    from .kernel.chunker import chunk_blocks

    rows = []
    for _url, d in _kernel_docs(n_pages):
        by_id = {b["block_id"]: b for b in d["blocks"]}
        for c in chunk_blocks(d["blocks"], d["doc_id"]):
            for bid in c["block_ids"]:
                b = by_id[bid]
                rows.append((c["chunk_id"], d["doc_id"], bid, b["type"],
                             b["reading_order"], b["anchor"]))
    return values_sql(rows, [
        ("chunk_id", "VARCHAR"), ("doc_id", "VARCHAR"),
        ("block_id", "VARCHAR"), ("type", "VARCHAR"),
        ("reading_order", "INTEGER"), ("anchor", "VARCHAR"),
    ])


def extract_pdf_mixed_sql(n_each: int = 80) -> str:
    from .datagen import make_pages
    from .kernel.htmlx import extract_document
    from .kernel.pdfx import extract_pdf_document, make_pdf

    rows = []
    for p in make_pages(n_each):
        d = extract_document(p["html"])
        rows.append((p["url"], d))
    for i in range(n_each):
        rows.append((f"pdf://doc/{i}", extract_pdf_document(make_pdf(i))))
    out = [
        (url, d["doc_id"], d["charset"], d["failure_code"], d["n_pages"],
         len(d["blocks"]), len(d["extracted_text"]))
        for url, d in rows
    ]
    return values_sql(out, [
        ("url", "VARCHAR"), ("doc_id", "VARCHAR"), ("charset", "VARCHAR"),
        ("failure_code", "VARCHAR"), ("n_pages", "INTEGER"),
        ("n_blocks", "INTEGER"), ("n_chars", "INTEGER"),
    ])


# --- independent-reimplementation goldens: xxhash64 fast paths ---------------

@lru_cache(maxsize=2)
def _oracle_documents():
    import duckdb

    path = os.path.join(SF_ORACLE_DIR, "documents.parquet")
    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id"
    ).fetchall()


def minhash_xx_sql() -> str:
    """Golden pairs from kernel.twins.lsh_pairs_xx — an independent
    pure-Python XXH64 + pipeline reimplementation (NOT Spark output)."""
    from .kernel.twins import lsh_pairs_xx

    pairs = lsh_pairs_xx(_oracle_documents())
    return values_sql(pairs, [("id_a", "BIGINT"), ("id_b", "BIGINT")])


def simhash64_sql() -> str:
    from .kernel.twins import simhash64

    rows = [(d, simhash64(t)) for d, t in _oracle_documents()]
    return values_sql(rows, [("doc_id", "BIGINT"), ("simhash", "BIGINT")])


def simhash_band_pairs_sql(bands: int = 4, max_hamming: int = 3) -> str:
    """Golden pairs for operators.dedup.simhash_near_dup_pairs: the Manku
    banded blocking + exact hamming verify re-run locally over the twin
    fingerprints (independent of Spark — same pure-Python xxhash64 chain
    as simhash64_sql)."""
    from .kernel.twins import simhash64

    fps = [(d, simhash64(t)) for d, t in _oracle_documents()]
    width = 64 // bands
    mask = (1 << width) - 1
    u64 = (1 << 64) - 1
    buckets: dict[tuple, list] = {}
    for d, fp in fps:
        u = fp & u64
        for b in range(bands):
            buckets.setdefault((b, (u >> (b * width)) & mask), []).append(
                (d, fp))
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, (da, fa) in enumerate(ms):
            for db, fb in ms[i + 1:]:
                if da != db and bin((fa ^ fb) & u64).count("1") <= max_hamming:
                    pairs.add((min(da, db), max(da, db)))
    return values_sql(sorted(pairs),
                      [("id_a", "BIGINT"), ("id_b", "BIGINT")])


def corpus_line_dedup_sql(n_pages: int = 300, min_repeat: int = 2) -> str:
    """Golden for C4-style corpus-level line dedup over the extracted texts:
    the whole count→drop→reassemble chain re-computed locally (Counter +
    list comprehension), compared as (doc_id, md5, kept, dropped)."""
    import hashlib as _h
    from collections import Counter

    docs = [(url, d["extracted_text"]) for url, d in _kernel_docs(n_pages)]
    cnt = Counter(l for _did, t in docs for l in t.split("\n") if l != "")
    dup = {l for l, c in cnt.items() if c >= min_repeat}
    rows = []
    for did, t in docs:
        ls = t.split("\n")
        kept = [l for l in ls if l not in dup]
        rows.append((
            did,
            _h.md5("\n".join(kept).encode("utf-8")).hexdigest(),
            len(kept), len(ls) - len(kept),
        ))
    return values_sql(rows, [
        ("url", "VARCHAR"), ("dedup_md5", "VARCHAR"),
        ("n_lines_kept", "INTEGER"), ("n_lines_dropped", "INTEGER"),
    ])


def bilingual_markdown_sql(n_pages: int = 300) -> str:
    """Golden for the paragraph-aware bilingual markdown chain: pages →
    extract → K1 markdown assembly → translate_markdown_bilingual
    (translator.py:260-318 semantics, dict stub in the model slot), all
    re-computed locally; compared as (doc_id, md5, length) to keep the
    VALUES small while still asserting byte identity."""
    import hashlib as _h

    from .kernel.twins import render_markdown_doc
    from .operators.translate import bilingual_markdown_py

    rows = []
    for _url, d in _kernel_docs(n_pages):
        md = render_markdown_doc(d["blocks"])
        if not md:
            continue
        b = bilingual_markdown_py(md)
        rows.append((d["doc_id"],
                     _h.md5(b.encode("utf-8")).hexdigest(), len(b)))
    return values_sql(rows, [
        ("doc_id", "VARCHAR"), ("bilingual_md5", "VARCHAR"),
        ("n_chars", "INTEGER"),
    ])


def dedup_corpus_sql(jaccard_threshold: float = 0.8, n: int = 5,
                     num_perm: int = 32, bands: int = 8) -> str:
    """Golden for the COMPOSED one-call `dedup_corpus` recipe — the whole
    exact → LSH-candidates → Jaccard-verify → components → keep-canonical
    chain re-run locally and independently (sha256 exact keys, pure-Python
    XXH64 LSH twin, set Jaccard with the same half-up 6-decimal rounding,
    union-find where Spark uses min-label propagation). The stages are
    each oracle-checked on their own; this pins their COMPOSITION."""
    import hashlib

    from .kernel.twins import (
        char_shingles,
        lsh_pairs_xx,
        normalized_text,
        round_half_up,
    )

    docs = _oracle_documents()
    # 1. exact/normalized dedup: min id per hash
    best: dict[str, int] = {}
    for d, t in docs:
        h = hashlib.sha256(normalized_text(t).encode("utf-8")).hexdigest()
        if h not in best or d < best[h]:
            best[h] = d
    texts = dict(docs)
    survivors = sorted(best.values())
    # 2. LSH candidates over the exact-deduped set  3. Jaccard verify
    sh = {d: char_shingles(texts[d], n) for d in survivors}
    verified = []
    for a, b in lsh_pairs_xx([(d, texts[d]) for d in survivors],
                             n, num_perm, bands):
        inter = len(sh[a] & sh[b])
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if round_half_up(j, 6) >= jaccard_threshold:
            verified.append((a, b))
    # 4./5. union-find (min root) → keep docs that are their own canonical
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    kept = [(d,) for d in survivors if find(d) == d]
    return values_sql(kept, [("doc_id", "BIGINT")])


def dup_components_sql() -> str:
    """Golden for connected components over the MinHash-LSH pair list:
    independent union-find over kernel.twins.lsh_pairs_xx (the pure-Python
    XXH64 pipeline twin), component = min doc id."""
    from .kernel.twins import lsh_pairs_xx

    pairs = lsh_pairs_xx(_oracle_documents())
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for p in pairs for n in p})
    rows = [(n, find(n)) for n in nodes]
    return values_sql(rows, [("doc_id", "BIGINT"), ("component", "BIGINT")])


def chunk_knn_sql(n_pages: int = 300, k: int = 3, n_queries: int = 3) -> str:
    """Golden for chunk-level similarity end-to-end: pages → extract →
    chunk → hashed embedding (L2-normalized float32, chunk.py:45 slot) →
    brute-force cosine top-k, all re-computed locally with zero Spark
    involvement (kernel + twins, IEEE operation order mirrored exactly)."""
    from .kernel.chunker import chunk_blocks
    from .kernel.twins import (brute_force_topk_rows, hash_embedding,
                               l2_normalize_f32)

    embs = {
        c["chunk_id"]: l2_normalize_f32(hash_embedding(c["text"]))
        for _url, d in _kernel_docs(n_pages)
        for c in chunk_blocks(d["blocks"], d["doc_id"])
    }
    qids = sorted(embs)[:n_queries]
    rows = brute_force_topk_rows(embs, qids, k)
    return values_sql(rows, [
        ("query_id", "VARCHAR"), ("cand_id", "VARCHAR"),
        ("cosine", "DOUBLE"), ("rank", "INTEGER"),
    ])


# --- independent SQL twins: ANN / IVF / image features / mdseg ---------------

def _dlist(vec) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"


def ann_topk_sql(dim: int = 64, k: int = 3, n_bits: int = 16,
                 bands: int = 8, seed: int = 42) -> str:
    """Full RP-LSH ANN in DuckDB: the seeded hyperplanes are embedded as
    literals (the same deterministic numpy draw the Spark expression uses);
    signature, banding, bucket join, and cosine re-rank are all DuckDB."""
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits, seed)
    bits_per_band = n_bits // bands
    mask = (1 << bits_per_band) - 1
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_dlist(planes[j])}) > 0 "
        f"THEN {2 ** j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS (SELECT vec_id, ({sig_terms}) AS sig FROM e),
cb AS (SELECT vec_id AS cand_id, b, (sig >> ({bits_per_band} * b)) & {mask} AS bucket
       FROM sigs, range({bands}) t(b)),
qb AS (SELECT vec_id AS query_id, b, (sig >> ({bits_per_band} * b)) & {mask} AS bucket
       FROM sigs, range({bands}) t(b) WHERE vec_id < 5),
cands AS (SELECT DISTINCT query_id, cand_id
          FROM cb JOIN qb USING (b, bucket) WHERE cand_id != query_id),
scored AS (
  SELECT query_id, cand_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine
  FROM cands JOIN e q ON q.vec_id = query_id JOIN e c ON c.vec_id = cand_id),
ranked AS (SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
           FROM scored)
SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= {k}
"""


@lru_cache(maxsize=2)
def _ivf_centroids(n_lists: int = 8, sample_n: int = 512, seed: int = 42):
    """Replicate the Spark-side deterministic quantizer sample — ordering by
    (pmod(xxhash64(vec_id), 1000003), vec_id) via the independent kernel.xxh
    — then the same numpy Lloyd fit. Only the (tiny) fitted model is shared
    between engines; assignment, probing and re-ranking are independent."""
    import duckdb
    import numpy as np

    from .kernel.xxh import spark_xxhash64
    from .operators.similarity import _kmeans_fit

    path = os.path.join(SF_ORACLE_DIR, "embeddings.parquet")
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{path}')"
    ).fetchall()
    keyed = sorted(
        rows, key=lambda r: (spark_xxhash64(r[0]) % 1_000_003, r[0])
    )[:sample_n]
    sample = np.vstack([r[1] for r in keyed]).astype("float64")
    return _kmeans_fit(sample, n_lists, seed=seed)


def ivf_topk_sql(k: int = 3, n_lists: int = 8, n_probe: int = 3) -> str:
    cents = _ivf_centroids(n_lists)
    cent_vals = ",\n".join(
        f"({j}, {_dlist(cents[j])})" for j in range(len(cents))
    )
    return f"""
WITH cents(list_id, c) AS (VALUES
{cent_vals}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assigned AS (
  SELECT vec_id AS cand_id, v AS cand_v,
         (SELECT c.list_id FROM cents c
          ORDER BY list_sum(list_transform(range(1, len(v) + 1),
                    i -> (v[i] - c.c[i]) * (v[i] - c.c[i]))), c.list_id
          LIMIT 1) AS list_id
  FROM e),
qd AS (
  SELECT q.vec_id AS query_id, q.v AS query_v, c.list_id,
         row_number() OVER (PARTITION BY q.vec_id
           ORDER BY list_sum(list_transform(range(1, len(q.v) + 1),
                     i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))), c.list_id
         ) AS rn
  FROM e q, cents c WHERE q.vec_id < 5),
probes AS (SELECT query_id, query_v, list_id FROM qd WHERE rn <= {n_probe}),
scored AS (
  SELECT query_id, cand_id,
         round(list_dot_product(query_v, cand_v)
               / (sqrt(list_dot_product(query_v, query_v))
                  * sqrt(list_dot_product(cand_v, cand_v))), 4) AS cosine
  FROM assigned JOIN probes USING (list_id)
  WHERE cand_id != query_id),
ranked AS (SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
           FROM scored)
SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= {k}
"""


# shared CTE chain: documents (doc_id < 100) → image features incl. the
# average-hash, re-implemented entirely in DuckDB list lambdas
_IMAGE_FEATURES_CTE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id, text,
         list_transform(string_split(substring(text, 1, 4096), ''),
                        c -> unicode(c) % 256) AS cp
  FROM documents WHERE doc_id < 100
),
px AS (
  -- tile the codepoints to fill the 64x64 canvas (kernel fake_decode_gray)
  SELECT media_id, text, cp,
         CASE WHEN len(cp) = 0
              THEN list_transform(range(4096), x -> 0)
              ELSE list_transform(range(4096), i -> cp[(i % len(cp)) + 1])
         END AS p
  FROM base
),
bm AS (
  SELECT media_id, text, cp,
         list_transform(range(64), k ->
           list_sum(list_transform(range(64), t ->
             p[((k // 8) * 8 + (t // 8)) * 64 + (k % 8) * 8 + (t % 8) + 1]
           )) / 64.0) AS means
  FROM px
),
hashed AS (
  SELECT media_id, text, cp,
         list_sum(list_transform(range(32), k ->
           CASE WHEN means[k + 1] > list_sum(means) / 64.0
                THEN (1::BIGINT << (31 - k)) ELSE 0 END)) AS hi,
         list_sum(list_transform(range(32), k ->
           CASE WHEN means[k + 33] > list_sum(means) / 64.0
                THEN (1::BIGINT << (31 - k)) ELSE 0 END)) AS lo
  FROM bm
),
ent AS (
  SELECT media_id, text, hi, lo,
         round(list_sum(list_transform(range(16), b ->
           (len(list_filter(cp, v -> v // 16 = b)) * 1.0
            / greatest(len(cp), 1)) ^ 2)), 6) AS entropy_q
  FROM hashed
),
feats AS (
  SELECT media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         entropy_q,
         printf('%08x%08x', CAST(coalesce(hi, 0) AS BIGINT),
                CAST(coalesce(lo, 0) AS BIGINT)) AS phash,
         CASE WHEN starts_with(text, 'GIF') THEN 'gif' ELSE 'unknown' END
           AS format_guess
  FROM ent
)
"""


def image_features_sql() -> str:
    """Full average-hash + features re-computed in DuckDB list lambdas over
    the same codepoint matrix the kernel fake-decoder builds. All block/global
    means are exact in doubles (denominators 64 and 4096), so the comparison
    is bit-exact. png/jpeg byte magics cannot occur as the UTF-8 encoding of
    a leading text char (0x89/0xFF are not valid UTF-8 lead bytes), so only
    the 'GIF' prefix is reachable — mirrored here."""
    return _IMAGE_FEATURES_CTE + """
SELECT media_id, n_bytes, entropy_q, phash, format_guess FROM feats
"""


def phash_near_dups_sql(max_hamming: int = 16) -> str:
    """Perceptual near-dup pairs (D3 end-to-end): Hamming distance between
    average-hashes computed nibble-wise over the hex strings (engine-portable
    — no 64-bit hex parsing needed in either engine)."""
    nib = ("(instr('0123456789abcdef', substring({col}, {i}, 1)) - 1)")
    ham = " + ".join(
        f"bit_count(xor({nib.format(col='a.phash', i=i)}, "
        f"{nib.format(col='b.phash', i=i)}))"
        for i in range(1, 17)
    )
    return _IMAGE_FEATURES_CTE + f"""
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST({ham} AS INT) AS hamming
FROM feats a JOIN feats b ON a.media_id < b.media_id
WHERE ({ham}) <= {max_hamming}
"""


def markdown_segment_sql() -> str:
    """Expected output of the mdseg kernel over the constructed per-doc
    markdown (heading + paragraph + conditional figure/table/formula) — the
    SQL derives every block and its reading order from the same modular
    conditions the Spark query uses to build the input."""
    return r"""
WITH d AS (
  SELECT doc_id, source,
         regexp_replace(text, '[\r\n]+', ' ', 'g') AS safe
  FROM documents
),
blocks AS (
  SELECT doc_id, 0 AS ro, 'title' AS type,
         'Doc ' || source || ' ' || doc_id AS text,
         '# Doc ' || source || ' ' || doc_id AS markdown
  FROM d
  UNION ALL
  SELECT doc_id, 1, 'text', trim('p: ' || safe), trim('p: ' || safe) FROM d
  UNION ALL
  SELECT doc_id, 2, 'figure', 'diagram ' || doc_id,
         '![diagram ' || doc_id || '](/img/' || doc_id || '.png)'
  FROM d WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id,
         2 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END),
         'table',
         'key | val' || chr(10) || 'k' || doc_id || ' | v' || doc_id,
         '| key | val |' || chr(10) || '| --- | --- |' || chr(10)
           || '| k' || doc_id || ' | v' || doc_id || ' |'
  FROM d WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id,
         2 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
           + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END),
         'formula', 'x^' || doc_id || ' + 1',
         '$$ x^' || doc_id || ' + 1 $$'
  FROM d WHERE doc_id % 5 = 0
)
SELECT doc_id, CAST(ro AS INT) AS reading_order, type, text, markdown
FROM blocks
"""


def quality_model_sql() -> str:
    """Golden for the hashed linear quality classifier: twin fold over the
    oracle documents, compared on the bit-exact linear score (round 6) and
    the keep flag."""
    from .kernel.twins import quality_model_score, round_half_up

    rows = []
    for d, t in _oracle_documents():
        # NULL text scores as empty — quality_model_score_expr coalesces
        # (a NULL score would lose the row from both gate branches)
        s = quality_model_score(t if t is not None else "")
        rows.append((d, round_half_up(s, 6), s > 0))
    return values_sql(rows, [("doc_id", "BIGINT"), ("score_lin", "DOUBLE"),
                             ("model_keep", "BOOLEAN")])
