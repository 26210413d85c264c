"""Pure-Python twins of the engine's xxhash64-based Spark fast paths.

Each function re-computes a whole pipeline result (not just a scalar) with
zero Spark involvement, on top of kernel.xxh's independent XXH64. They serve
as golden-oracle generators for the driver correctness gate (the literal
VALUES oracles in __spark_entry__.oracle_sql) and as pytest equality
references — if the Spark plan and this code agree row-for-row, the JVM
expression tree, the Arrow boundary, and the Python reimplementation all
corroborate each other.

Semantics notes (must match the Spark expressions EXACTLY):
- Java regex \\s is ASCII [ \\t\\n\\x0B\\f\\r]; Python's re \\s is
  Unicode-aware — the twins use the explicit ASCII class;
- Spark F.min over longs is a SIGNED min; xxh values are kept signed;
- substring(norm, i, 5) near the string tail yields short shingles when
  len(norm) < 5 (the i-range max(len-4, 1) otherwise stays in bounds).
"""

from __future__ import annotations

import hashlib
import math
import re
import struct
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

from .xxh import _signed, spark_xxhash64, xxh64_bytes, xxh64_int

_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def normalized_text(text: str) -> str:
    """Twin of functions.normalized_text_expr (lower + ws-collapse + trim).
    MUST strip ASCII spaces only: Spark's F.trim removes ' ' while
    Python's bare str.strip() removes Unicode whitespace (NBSP, ideographic
    space, …) — a bare strip() diverged on '\\xa0leading nbsp' inputs
    (caught by the r4 adversarial quality-model twin test)."""
    return _ASCII_WS.sub(" ", text.lower()).strip(" ")


def char_shingles(text: str, n: int = 5) -> set[str]:
    """Twin of the operator shingle shape (operators/dedup.py
    minhash_signature): substring(norm, i, n) for i in 1..max(len-n+1, 1),
    distinct."""
    norm = normalized_text(text)
    top = max(len(norm) - (n - 1), 1)
    return {norm[i:i + n] for i in range(top)}


@lru_cache(maxsize=1 << 20)
def _gram_seed(g: str) -> int:
    # shingle-hash is independent of the perm index (the chain hashes the
    # string first); caching it makes golden generation corpus-vocabulary
    # bound instead of shingles × perms bound
    return xxh64_bytes(g.encode("utf-8"), 42)


def minhash_signature_xx(text: str, n: int = 5, num_perm: int = 8) -> list[int]:
    """Twin of operators.dedup.minhash_signature flavor='xx': component j =
    signed min over shingles of xxhash64(shingle, j) — the perm index is a
    bare F.lit(j) IntegerType literal, hashed through the 4-byte path with
    the string hash as its seed."""
    seeds = [_gram_seed(g) for g in char_shingles(text, n)]
    return [min(_signed(xxh64_int(j, s)) for s in seeds)
            for j in range(num_perm)]


def lsh_pairs_xx(docs: list[tuple], n: int = 5, num_perm: int = 8,
                 bands: int = 4) -> list[tuple]:
    """Twin of operators.dedup.lsh_candidate_pairs flavor='xx' over
    (id, text) rows: banded sha256 buckets, distinct (a < b) pairs."""
    rows = num_perm // bands
    buckets: dict[tuple, list] = {}
    for doc_id, text in docs:
        sig = minhash_signature_xx(text, n, num_perm)
        for b in range(bands):
            key_src = "|".join(str(sig[j]) for j in range(b * rows, (b + 1) * rows))
            bucket = hashlib.sha256(key_src.encode("utf-8")).hexdigest()
            buckets.setdefault((b, bucket), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b_ in ms[i + 1:]:
                if a != b_:
                    pairs.add((a, b_))
    return sorted(pairs)


@lru_cache(maxsize=1 << 20)
def _token_hash(t: str) -> int:
    return spark_xxhash64(t)


def simhash64(text: str) -> int:
    """Twin of operators.dedup.simhash (bits=64): per-token xxhash64 votes,
    signed fingerprint with bit 63 as -(2^63). Note F.trim trims ASCII
    spaces only — mirrored here."""
    toks = _ASCII_WS.split(text.strip(" ").lower())
    votes = [0] * 64
    for t in toks:
        h = _token_hash(t)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp += (1 << b) if b < 63 else -(1 << 63)
    return fp


# --- hashed-embedding / cosine twins (chunk-level similarity golden) ---------

def hash_embedding(text: str, dim: int = 32) -> list[float]:
    """Twin of functions.hash_embedding_expr: token -> bucket via the first
    two hex chars of md5(token), bucket counts as doubles. Counts are exact
    integers, so summation order is irrelevant here."""
    v = [0.0] * dim
    for t in normalized_text(text).split(" "):
        if t:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            v[int(h[:2], 16) % dim] += 1.0
    return v


def _f32(x: float) -> float:
    """Round-to-nearest float32, returned as the exact double it denotes —
    bit-identical to the JVM's (float) cast in embed_chunks."""
    return struct.unpack("f", struct.pack("f", x))[0]


def l2_normalize_f32(v: list[float]) -> list[float]:
    """Twin of functions.l2_normalize_expr + embed_chunks' float cast:
    sequential-fold sum of squares (matches F.aggregate's left fold),
    IEEE sqrt/divide, then float32."""
    acc = 0.0
    for x in v:
        acc += x * x
    safe = max(math.sqrt(acc), 1e-12)
    return [_f32(x / safe) for x in v]


def cosine_seq(a: list[float], b: list[float]) -> float:
    """Twin of functions.cosine_expr: products via zip, sequential left-fold
    sums, dot/(na*nb) — same IEEE operation order as the Spark expression."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom != 0.0 else float("nan")


def round_half_up(x: float, nd: int = 4) -> float:
    """Twin of Spark F.round on doubles (BigDecimal HALF_UP over the
    shortest decimal repr — Python repr() is the same shortest repr)."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def brute_force_topk_rows(embs: dict, query_ids: list, k: int = 3) -> list[tuple]:
    """Twin of operators.similarity.brute_force_topk over {id: vec}: rounded
    cosine desc, id asc tiebreak, row_number <= k."""
    rows = []
    for qid in query_ids:
        scored = sorted(
            ((round_half_up(cosine_seq(embs[qid], v), 4), cid)
             for cid, v in embs.items() if cid != qid),
            key=lambda s: (-s[0], s[1]),
        )
        rows += [(qid, cid, cos, r)
                 for r, (cos, cid) in enumerate(scored[:k], 1)]
    return rows


def render_markdown_doc(blocks: list[dict]) -> str:
    """Twin of operators.pagemerge.render_markdown_doc (K1 sink,
    writer.py:80-87 semantics): markdown-bearing blocks in reading order,
    '\\n---\\n<!-- Page N -->\\n\\n' before each page's first block (page>1),
    '\\n\\n' between blocks otherwise."""
    mds = [b for b in sorted(blocks, key=lambda b: b["reading_order"])
           if b["markdown"]]
    first_ro = {}
    for b in mds:
        first_ro.setdefault(b["page"], b["reading_order"])
    out = []
    for b in mds:
        if first_ro[b["page"]] == b["reading_order"] and b["page"] > 1:
            out.append("\n---\n<!-- Page %d -->\n\n" % b["page"])
        elif b["reading_order"] > 0:
            out.append("\n\n")
        out.append(b["markdown"])
    return "".join(out)


def quality_model_score(text: str, dim: int = 128, seed: int = 13) -> float:
    """Twin of functions.quality_model_score_expr's score_lin: hashed
    unigram+bigram features → literal-weight lookups folded left-to-right
    (IEEE addition is order-deterministic, so this is BIT-exact vs the
    Spark fold), mean over features, plus bias."""
    from ..functions import quality_model_weights

    ws, bias = quality_model_weights(dim, seed)
    toks = [t for t in normalized_text(text or "").split(" ") if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    total = 0.0
    for f in feats:
        total = total + ws[_token_hash(f) % dim]
    return total / float(max(len(feats), 1)) + bias
