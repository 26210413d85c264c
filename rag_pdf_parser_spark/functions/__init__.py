"""Native Spark Column expressions for the engine's scalar semantics.

Every function here is pure `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen'd, zero Python on the hot path. Each mirrors a kernel
function (unit-tested equal) and a reference behavior (cited).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode classes (exact reference ranges, extractor.py:358-387 /
# chunk.py:102-108)
HANGUL_CLASS = "[\uac00-\ud7af]"
CJK_CLASS = "[\u4e00-\u9fff]"
CJK_TOKEN_CLASS = "[\u4e00-\u9fff\uac00-\ud7af\u3040-\u309f\u30a0-\u30ff]"


def _count_class(col: Column, cls: str) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, cls, ""))


def lang_expr(col: Column) -> Column:
    """Char-class language detection — reference
    /root/reference/src/text/extractor.py:358-387 semantics, as a pure
    expression (SURVEY §2.4 A4). Kernel twin: kernel.lang.detect_language."""
    korean = _count_class(col, HANGUL_CLASS)
    chinese = _count_class(col, CJK_CLASS)
    ascii_alpha = _count_class(col, "[A-Za-z]")
    total = (korean + chinese + ascii_alpha).cast("double")
    return (
        F.when(col.isNull() | (F.length(col) == 0), F.lit("unknown"))
        .when(total == 0, F.lit("unknown"))
        .when(korean / total > 0.3, F.lit("ko"))
        .when(chinese / total > 0.3, F.lit("zh"))
        .when(ascii_alpha / total > 0.5, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def token_estimate_expr(col: Column) -> Column:
    """Token estimator — /root/reference/src/models/chunk.py:92-108:
    int(cjk/1.5 + other/4). Kernel twin: kernel.tokens.estimate_tokens."""
    cjk = _count_class(col, CJK_TOKEN_CLASS).cast("double")
    other = F.length(col).cast("double") - cjk
    return F.floor(cjk / 1.5 + other / 4.0).cast("int")


def anchor_expr(page: Column, btype: Column, order: Column) -> Column:
    """Citation anchor '[@p{page}_{abbrev}{order}]' —
    /root/reference/src/models/block.py:62-70 (8-entry map, fallback
    type[:3])."""
    abbrev = (
        F.when(btype == "text", F.lit("txt"))
        .when(btype == "title", F.lit("ttl"))
        .when(btype == "section_header", F.lit("sec"))
        .when(btype == "table", F.lit("tbl"))
        .when(btype == "figure", F.lit("fig"))
        .when(btype == "chart", F.lit("cht"))
        .when(btype == "formula", F.lit("eq"))
        .when(btype == "picture", F.lit("fig"))
        .otherwise(F.substring(btype, 1, 3))
    )
    return F.format_string("[@p%d_%s%d]", page, abbrev, order)


def doc_id_expr(html: Column) -> Column:
    """sha256[:16] of source bytes — block.py:226-230."""
    return F.substring(F.sha2(html, 256), 1, 16)


def content_hash_expr(text: Column) -> Column:
    """sha256[:12] of text — chunk.py:86-88 (D5)."""
    return F.substring(F.sha2(text, 256), 1, 12)


def normalized_text_expr(text: Column) -> Column:
    """Lowercase + whitespace-collapse + trim — deduplicator.py:79-83 (D2)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def normalized_text_hash_expr(text: Column) -> Column:
    return F.sha2(normalized_text_expr(text), 256)


def url_normalize_expr(url: Column) -> Column:
    """Lowercase, drop query string, strip trailing '/' —
    deduplicator.py:103-112 (D4)."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(url), r"[?].*$", ""), r"/+$", ""
    )


def markdown_expr(btype: Column, text: Column) -> Column:
    """Type-dispatched markdown — ir_processor.py:341-362 (X2) for the
    text-like types (tables/figures render inside the extraction kernel)."""
    return (
        F.when(btype == "title", F.concat(F.lit("# "), text))
        .when(btype == "section_header", F.concat(F.lit("## "), text))
        .when(btype == "caption", F.concat(F.lit("*"), text, F.lit("*")))
        .otherwise(text)
    )


# NOTE (r4): the former char_ngrams_expr / minhash_sha_expr helpers were
# deleted — nothing referenced them, and the materialized-array explode
# shape char_ngrams_expr embodied measured 37× slower than the
# index-sequence Generate the shipping operators use
# (operators/dedup.py minhash_signature). Shingle semantics live on in
# kernel/twins.py:char_shingles (pure-Python oracle twin).


def quality_features_expr(text: Column) -> dict[str, Column]:
    """Deterministic text-quality features (training-data pipeline op):
    length, alpha/digit/punct/space ratios, mean word length, stopword hits."""
    length = F.length(text).cast("double")
    safe_len = F.greatest(length, F.lit(1.0))
    alpha = _count_class(text, "[A-Za-z]").cast("double")
    digit = _count_class(text, "[0-9]").cast("double")
    punct = _count_class(text, r"[\.,;:!?'\"()\[\]{}-]").cast("double")
    spaces = _count_class(text, "[ ]").cast("double")
    n_words = F.size(F.split(F.trim(text), r"\s+")).cast("double")
    stop_hits = (
        F.size(
            F.filter(
                F.split(F.lower(text), r"\s+"),
                lambda w: w.isin("the", "a", "an", "and", "or", "of", "to",
                                 "in", "is", "that"),
            )
        ).cast("double")
    )
    return {
        "n_chars": length.cast("long"),
        "n_words": n_words.cast("long"),
        "alpha_ratio": F.round(alpha / safe_len, 6),
        "digit_ratio": F.round(digit / safe_len, 6),
        "punct_ratio": F.round(punct / safe_len, 6),
        "space_ratio": F.round(spaces / safe_len, 6),
        "mean_word_len": F.round((length - spaces) / F.greatest(n_words, F.lit(1.0)), 6),
        "stopword_ratio": F.round(stop_hits / F.greatest(n_words, F.lit(1.0)), 6),
    }


def quality_score_expr(text: Column) -> Column:
    """Composite quality score, scaled to 1e8 micro-units (BIGINT): rewards
    alpha-dominant, stopword-bearing, moderately long text; penalizes
    digit/punct noise. Deliberately float-free at the output (floor-based
    integer pipeline) so the value is bit-identical across engines — double
    round() half-way behavior differs between Spark and DuckDB."""
    length = F.length(text).cast("double")
    safe_len = F.greatest(length, F.lit(1.0))
    alpha = _count_class(text, "[A-Za-z]").cast("double")
    digit = _count_class(text, "[0-9]").cast("double")
    punct = _count_class(text, r"[\.,;:!?'\"()\[\]{}-]").cast("double")
    n_words = F.greatest(
        F.size(F.split(F.trim(text), r"\s+")).cast("double"), F.lit(1.0)
    )
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(text), r"\s+"),
            lambda w: w.isin("the", "a", "an", "and", "or", "of", "to",
                             "in", "is", "that"),
        )
    ).cast("double")
    a_u = F.floor(alpha * 1000000.0 / safe_len)
    d_u = F.floor(digit * 1000000.0 / safe_len)
    p_u = F.floor(punct * 1000000.0 / safe_len)
    st_u = F.least(F.floor(stop_hits * 3000000.0 / n_words), F.lit(1000000))
    len_u = F.least(F.length(text).cast("long") * 2000, F.lit(1000000))
    raw = 35 * a_u + 25 * st_u + 25 * len_u - 10 * d_u - 5 * p_u
    return F.greatest(
        F.least(raw, F.lit(100000000)), F.lit(0)
    ).cast("long")


def fingerprint_expr(text: Column, prefix_len: int = 128) -> Column:
    """Polynomial rolling-hash document fingerprint over the first
    `prefix_len` chars of the ASCII-projected normalized text:
    acc = (acc*31 + code) mod 1_000_000_007. Engine-portable (same arithmetic
    in the DuckDB oracle)."""
    ascii_text = F.substring(
        F.regexp_replace(normalized_text_expr(text), "[^ -~]", ""), 1, prefix_len
    )
    chars = F.split(ascii_text, "")
    return F.aggregate(
        F.filter(chars, lambda c: F.length(c) > 0),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(1_000_000_007).cast("long"),
    )


def hash_embedding_expr(text: Column, dim: int = 32) -> Column:
    """Hashed bag-of-words text embedding (feature hashing / 'hashing
    trick'): token → bucket via the first two hex chars of md5(token)
    (portable to DuckDB without bigint hex parsing), bucket counts as a
    dense double vector. The training-data pipeline's deterministic
    text→vector source; L2-normalize via `l2_normalize_expr` for cosine
    workloads. Pure expressions — no UDF, no shuffle."""
    assert dim <= 256, "two-hex-char bucketing supports dim <= 256"
    toks = F.filter(F.split(normalized_text_expr(text), " "),
                    lambda t: F.length(t) > 0)
    hexes = F.lit("0123456789abcdef")

    def bucket(t: Column) -> Column:
        h = F.md5(t)
        return (
            (F.instr(hexes, F.substring(h, 1, 1)) - 1) * 16
            + (F.instr(hexes, F.substring(h, 2, 1)) - 1)
        ) % dim

    # Hash each token ONCE into an int bucket index, THEN fold the index
    # array into the dim-wide accumulator. Referencing md5 inside the
    # per-element accumulator lambda would re-evaluate it dim× per token
    # (the HOF re-evaluation trap) — here the only work inside the fold is
    # an int compare.
    bucket_idx = F.transform(toks, bucket)
    init = F.array(*[F.lit(0.0)] * dim)
    return F.aggregate(
        bucket_idx, init,
        lambda acc, b: F.transform(
            acc, lambda v, i: v + F.when(b == i, F.lit(1.0))
            .otherwise(F.lit(0.0))
        ),
    )


def l2_normalize_expr(vec: Column) -> Column:
    """v / max(||v||, 1e-12), elementwise — pure expression."""
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, v: a + v * v))
    safe = F.greatest(norm, F.lit(1e-12))
    return F.transform(vec, lambda v: v / safe)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two float arrays via zip_with + aggregate —
    JVM-side, no UDF (similarity-search baseline)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def gopher_features_expr(text: Column, toks: Column | None = None,
                         bigrams: Column | None = None) -> dict[str, Column]:
    """Gopher/C4-style web-text quality filters (Rae et al. 2021 'Scaling
    Language Models' §A1.1; Raffel et al. 2020 C4 heuristics) as pure
    expressions — the standard pre-training corpus gate, word-level subset
    (line-level repetition lives in `line_features_expr`):

    - word count + mean word length windows,
    - fraction of words containing an alphabetic char,
    - symbol-to-word ratio ('#', '...', '…'),
    - top-bigram fraction (repetition): computed scale-cleanly as the
      longest run in the SORTED bigram array (one O(n log n) array_sort +
      linear fold — no O(n²) per-doc counting),
    - C4 cues: 'lorem ipsum', '{' (code), terminal punctuation.

    `gopher_keep` applies the standard thresholds (50..100k words, mean word
    length 3..10, symbol ratio < 0.1, alpha-word fraction > 0.8, top-bigram
    fraction < 0.2). All ratios are exact-integer divisions in IEEE double —
    deterministic across engines; the DuckDB twin recomputes independently
    (mode-count formulation instead of sorted runs).

    `toks` (raw-case token array) and `bigrams` (lowercased adjacent-pair
    array) accept PRE-STAGED columns so a composed plan (plans/curate.py
    flag_corpus) tokenizes once for all gates — bit-identical to the
    defaults, which build both from `text` here."""
    if toks is None:
        toks = F.filter(F.split(F.trim(text), r"\s+"),
                        lambda t: F.length(t) > 0)
    n_words = F.size(toks).cast("double")
    safe_words = F.greatest(n_words, F.lit(1.0))
    word_chars = F.length(F.regexp_replace(text, r"\s", "")).cast("double")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
    n_sym = (
        F.regexp_count(text, F.lit("#"))
        + F.regexp_count(text, F.lit(r"\.\.\."))
        + F.regexp_count(text, F.lit("…"))
    ).cast("double")

    if bigrams is None:
        low = F.transform(toks, F.lower)
        # adjacent pairs via zip_with(low, low-shifted-by-one): `low` is
        # referenced a constant number of times (each an O(n) evaluation).
        # Building bigrams as transform(sequence, i -> element_at(low, i)...)
        # instead re-evaluates `low` PER ELEMENT — the O(n²) HOF
        # re-evaluation trap (measured: 19.4 s → 1.6 s at sf0.1).
        bigrams = gram_step_expr(low, low, 2)
    sorted_b = F.array_sort(bigrams)
    run_acc = F.aggregate(
        sorted_b,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_bigram_frac = (
        run_acc["best"].cast("double")
        / F.greatest(F.size(sorted_b).cast("double"), F.lit(1.0))
    )

    mean_word_len = word_chars / safe_words
    frac_alpha = alpha_words / safe_words
    sym_ratio = n_sym / safe_words
    keep = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (sym_ratio < 0.1) & (frac_alpha > 0.8) & (top_bigram_frac < 0.2)
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_word_len, 6),
        "frac_alpha_words": F.round(frac_alpha, 6),
        "symbol_word_ratio": F.round(sym_ratio, 6),
        "top_bigram_frac": F.round(top_bigram_frac, 6),
        "has_lorem": F.lower(text).contains("lorem ipsum"),
        "has_brace": text.contains("{"),
        "ends_terminal_punct": text.rlike('[.!?"]\\s*$'),
        "gopher_keep": keep,
    }


def line_features_expr(text: Column) -> dict[str, Column]:
    """Line-level Gopher repetition/format features (duplicate-line
    fraction via sorted-run fold, bullet-start and ellipsis-end line
    fractions, terminal-punctuation line fraction). Same sorted-run trick
    as the bigram stat — O(n log n) per doc, no joins."""
    lines = F.filter(F.split(text, "\n", -1),
                     lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    sorted_l = F.array_sort(lines)
    dup_acc = F.aggregate(
        sorted_l,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("dups")),
        lambda acc, l: F.struct(
            l.alias("prev"),
            (acc["dups"] + F.when(l == acc["prev"], 1).otherwise(0))
            .alias("dups"),
        ),
    )
    frac = lambda cond: (  # noqa: E731
        F.size(F.filter(lines, cond)).cast("double") / n_lines)
    return {
        "n_lines": F.size(lines).cast("long"),
        "dup_line_frac": F.round(dup_acc["dups"].cast("double") / n_lines, 6),
        "frac_bullet_lines": F.round(
            frac(lambda l: F.trim(l).rlike("^[-*•]")), 6),
        "frac_ellipsis_lines": F.round(
            frac(lambda l: l.rlike(r"(\.\.\.|…)\s*$")), 6),
        "frac_lines_term_punct": F.round(
            frac(lambda l: l.rlike('[.!?"]\\s*$')), 6),
    }


#: PII patterns (training-data scrubbing): RE2-safe (no lookaround), so the
#: same pattern strings run verbatim in Spark (Java regex) and the DuckDB
#: twin (RE2).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9 ()\-]{7,}[0-9]"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub_expr(text: Column) -> dict[str, Column]:
    """PII scrubbing for pre-training corpora: redact emails, phone-like
    number runs, and IPv4 literals with typed placeholder tokens; report
    per-kind redaction counts. Order matters (emails first — a phone regex
    must not eat digits inside an already-redacted span); counts are
    measured on the ORIGINAL text per kind-in-sequence, matching the
    replacement order."""
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE, "<PHONE>")
    scrubbed = F.regexp_replace(after_phone, PII_IPV4, "<IP>")
    return {
        "scrubbed": scrubbed,
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)),
        "n_phones": F.regexp_count(after_email, F.lit(PII_PHONE)),
        "n_ips": F.regexp_count(after_phone, F.lit(PII_IPV4)),
    }


# --- hashed linear quality model (CCNet/fastText-style classifier slot) -----

QUALITY_MODEL_DIM = 128


@_lru_cache(maxsize=8)
def _qmw_list(dim: int, seed: int) -> tuple:
    import hashlib

    def w(tag):
        h = int.from_bytes(
            hashlib.sha256(f"qw-{seed}-{tag}".encode()).digest()[:8], "big")
        return (h / 2.0 ** 63) - 1.0  # [-1, 1)

    return tuple(w(i) for i in range(dim)), w("bias")


def quality_model_weights(dim: int = QUALITY_MODEL_DIM,
                          seed: int = 13) -> tuple[list[float], float]:
    """Deterministic stand-in parameters for the model-based quality
    classifier (the CCNet / GPT-3-era fastText quality filter slot). In
    production these are TRAINED logistic-regression weights loaded from a
    model artifact; the sandbox has no model file, so a seeded sha256 chain
    generates a fixed pseudo-model — the INFERENCE path (feature hashing,
    weight lookup, fold, calibration) is the real, tested component.
    Returns (weights[dim], bias). Cached — oracle twins call this per row."""
    ws, bias = _qmw_list(dim, seed)
    return list(ws), bias


def quality_model_score_expr(text: Column,
                             dim: int = QUALITY_MODEL_DIM,
                             seed: int = 13,
                             toks: Column | None = None,
                             bigrams: Column | None = None) -> Column:
    """Linear text-quality classifier score over hashed unigram+bigram
    features (the 'hashing trick' a la fastText/CCNet): feature f → bucket
    pmod(xxhash64(f), dim) → weight lookup → mean over features + bias.
    NULL text behaves as empty (scores exactly the bias) — a NULL score
    would make a keep/drop gate silently lose the row from both branches.

    BIT-exact across engines (literal weights, one left-to-right fold —
    IEEE addition is order-deterministic, no transcendental ops), so the
    oracle compares it exactly.

    Returns the raw score COLUMN — one fold. Derive the sigmoid/keep from
    it in a SECOND select (`with_quality_model`): putting all three in one
    projection re-inlines the whole fold per reference (CollapseProject
    duplicates non-cheap siblings).

    Scale shape: pure expressions, zero shuffle, O(tokens) — the weight
    array rides the plan as a literal (a real model's ~10^5-dim weights
    would ship via broadcast + `F.element_at` on a map/array column
    instead; same plan shape)."""
    ws, bias = quality_model_weights(dim, seed)
    # pre-staged toks/bigrams (flag_corpus): tokenize-once composition —
    # bit-identical to the default construction from `text`
    if toks is None:
        toks = word_tokens_expr(F.coalesce(text, F.lit("")))
    if bigrams is None:
        bigrams = word_ngram_chain_expr(toks, 2)[2]
    feats = F.concat(toks, bigrams)
    weights = F.array(*[F.lit(float(x)) for x in ws])
    # hash each feature ONCE in a projection, then fold weight lookups —
    # only an element_at happens inside the accumulator (HOF trap avoided)
    buckets = F.transform(feats, lambda f: F.pmod(F.xxhash64(f), F.lit(dim)))
    total = F.aggregate(
        buckets, F.lit(0.0),
        lambda acc, b: acc + F.element_at(weights, b.cast("int") + 1),
    )
    return total / F.greatest(F.size(feats), F.lit(1)).cast("double") \
        + F.lit(float(bias))


def with_quality_model(df, text_col: str = "text",
                       dim: int = QUALITY_MODEL_DIM, seed: int = 13,
                       toks: Column | None = None,
                       bigrams: Column | None = None):
    """df + score_lin / quality_p (monotone sigmoid calibration — exp may
    differ by an ULP across libms, so thresholds belong on score_lin) /
    model_keep. Two selects so the feature fold runs ONCE (the derived
    columns reference the score ATTRIBUTE, which CollapseProject refuses
    to re-inline for multiply-referenced non-cheap expressions)."""
    staged = df.withColumn(
        "score_lin", quality_model_score_expr(F.col(text_col), dim, seed,
                                              toks, bigrams))
    s = F.col("score_lin")
    return (staged
            .withColumn("quality_p", F.lit(1.0) / (F.lit(1.0) + F.exp(-s)))
            .withColumn("model_keep", s > 0))


# --- word n-gram primitives (shared by dedup / repetition / quality) --------

def word_tokens_expr(text: Column, pre_normalized: bool = False) -> Column:
    """Non-empty whitespace tokens of the normalized text."""
    norm = text if pre_normalized else normalized_text_expr(text)
    return F.filter(F.split(norm, " " if pre_normalized else r"\s+"),
                    lambda t: F.length(t) > 0)


def gram_step_expr(prev: Column, toks: Column, n: int) -> Column:
    """ONE level of the zip-shift gram fold: (n-1)-grams `prev` extended by
    the (n-1)-shifted token array into n-grams. THE canonical idiom —
    building grams with `transform(sequence, i -> slice/element_at(...))`
    instead re-evaluates the derived array PER ELEMENT (the HOF O(n²)
    trap — the 19.4 s → 2.2 s bigram lesson, see gopher_features_expr).
    Consumed by `word_ngram_chain_expr` (expression chains) and
    `with_repetition_features` (column-staged chain)."""
    shifted = F.slice(toks, n, F.greatest(F.size(toks) - (n - 1),
                                          F.lit(0)))
    return F.filter(
        F.zip_with(prev, shifted,
                   lambda a, b: F.when(b.isNotNull(),
                                       F.concat(a, F.lit(" "), b))),
        lambda x: x.isNotNull(),
    )


def word_ngram_chain_expr(toks: Column, n_max: int) -> dict[int, Column]:
    """Word n-gram arrays for n=1..n_max, each built from the previous by
    one `gram_step_expr` — every reference is a constant-count O(tokens)
    pass. Single home for the gram idiom; decontamination, word-MinHash,
    and the quality classifier consume it from here (the repetition family
    stages the same steps as real columns — with_repetition_features)."""
    grams: dict[int, Column] = {1: toks}
    for n in range(2, n_max + 1):
        grams[n] = gram_step_expr(grams[n - 1], toks, n)
    return grams


def token_ngrams_expr(text: Column, n: int = 13,
                      pre_normalized: bool = False) -> Column:
    """Array of token n-grams of the normalized text (the decontamination /
    word-shingle building block). `pre_normalized=True` skips the
    lower+ws-collapse when the caller already normalized."""
    toks = word_tokens_expr(text, pre_normalized)
    return word_ngram_chain_expr(toks, n)[n]


# --- full Gopher repetition suite (Rae et al. 2021 §A1.1) -------------------


def _top_gram_chars(sorted_grams: Column) -> Column:
    """Characters covered by the most frequent gram: count(top) × len(top),
    ties broken toward the lexicographically smallest gram (strict-> update
    over the sorted array — deterministic, mirrored by the oracle's
    ORDER BY count DESC, gram ASC LIMIT 1)."""
    acc = F.aggregate(
        sorted_grams,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best"), F.lit(0).alias("blen")),
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(g == a["prev"], a["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(a["best"],
                       F.when(g == a["prev"], a["run"] + 1)
                       .otherwise(F.lit(1))).alias("best"),
            F.when(
                F.when(g == a["prev"], a["run"] + 1).otherwise(F.lit(1))
                > a["best"], F.length(g)
            ).otherwise(a["blen"]).alias("blen"),
        ),
    )
    # count and length each fit an int (Java strings cap at 2^31 chars) but
    # their PRODUCT can overflow 32 bits on a pathological repeated-blob
    # page — widen before multiplying (the DuckDB twin sums in BIGINT)
    return (acc["best"].cast("long") * acc["blen"]).cast("double")


def _dup_gram_chars(sorted_grams: Column) -> Column:
    """Characters in duplicate grams: Σ over distinct grams with count c>1
    of (c-1)·len(gram) — the standard overlap-agnostic Gopher accounting
    (every occurrence beyond the first counts its characters)."""
    # LONG accumulator: the summed duplicate-gram characters can exceed
    # 2^31 on a large repeated-blob page (dup chars approach n·doc_len) —
    # a 32-bit wrap would turn the most repetitive possible document into
    # frac<0 → repetition_keep=true (ANSI mode would throw instead)
    acc = F.aggregate(
        sorted_grams,
        F.struct(F.lit("").alias("prev"), F.lit(0).cast("long").alias("dc")),
        lambda a, g: F.struct(
            g.alias("prev"),
            (a["dc"] + F.when(g == a["prev"], F.length(g).cast("long"))
             .otherwise(F.lit(0).cast("long"))).alias("dc"),
        ),
    )
    return acc["dc"].cast("double")


#: Gopher §A1.1 published removal thresholds
REPETITION_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
REPETITION_DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                             9: 0.11, 10: 0.10}


# (The former one-select `repetition_features_expr` was deleted — dead
# code after the staged rewrite below, and a second parallel
# implementation of the same stats that would silently diverge. The
# DuckDB twin in __spark_entry__._repetition_filters_sql mirrors
# `with_repetition_features`.)


def with_repetition_features(df, text_col: str = "text"):
    """df + the COMPLETE Gopher repetition-filter family (Rae et al. 2021
    §A1.1), beyond the subset in `gopher_features_expr`:

    - top n-gram CHARACTER fraction for n ∈ {2,3,4} (chars covered by the
      single most frequent word n-gram / total chars),
    - duplicate n-gram character fraction for n ∈ {5..10} (chars in all
      occurrences beyond the first of each distinct n-gram / total chars,
      overlap-agnostic, capped at 1),
    - duplicate paragraph fraction + duplicate paragraph CHARACTER
      fraction (paragraphs = '\\n\\n'-separated, trimmed, non-empty),
    - `repetition_keep` applying the published thresholds.

    All per-doc O(tokens·n_max + n log n) sorted-run folds — zero shuffle,
    zero UDF; NULL text behaves as empty (all fractions 0, keep true).
    Two structural tricks, both CollapseProject-aware:

    1. The gram CHAIN is staged level-by-level as real columns (__g2 built
       from __toks, __g3 from __g2, …): each level is referenced by the
       next level AND its own stat column (2 non-cheap refs), so
       CollapseProject keeps the staging and every zip-shift pass runs
       ONCE per row. Inlining everything into one projection re-derives
       level n from scratch per column — Σ(n-1) = 45 chain passes plus
       the same again for keep; measured 14.1 s → ~3 s at sf0.1.
    2. `repetition_keep` reads the fraction ATTRIBUTES in a later select
       (same rule), so thresholds apply to the rounded 6-decimal values —
       a distinction without a difference at these thresholds (the DuckDB
       twin thresholds the rounded values identically).

    Plan-asserted in tests (zip_with count ≈ 9, one per chain level).

    The three pieces (`stage_repetition_chain`, `repetition_stat_cols`,
    `repetition_keep_expr`) are exposed separately so the composed
    curation plan (plans/curate.py flag_corpus) can share ONE staged
    token/gram chain across the gopher, repetition, and quality-model
    gates instead of tokenizing three times."""
    safe = F.coalesce(F.col(text_col), F.lit(""))
    staged = stage_repetition_chain(
        df.withColumn("__toks", word_tokens_expr(safe)), safe)
    staged = staged.select(
        *[c for c in df.columns],
        *[c.alias(k) for k, c in repetition_stat_cols().items()])
    return staged.withColumn("repetition_keep", repetition_keep_expr())


def stage_repetition_chain(df, safe: Column):
    """Stage the repetition family's working columns on top of an already
    present lowercase token column `__toks`: `__tc` (char denominator),
    the word n-gram chain `__g2`..`__g10` (level-by-level — see
    with_repetition_features docstring trick #1), and `__sp` (sorted
    non-empty paragraphs)."""
    staged = df.withColumn(
        "__tc", F.greatest(F.length(safe).cast("double"), F.lit(1.0)))
    for n in range(2, 11):
        prev = F.col("__toks") if n == 2 else F.col(f"__g{n - 1}")
        staged = staged.withColumn(
            f"__g{n}", gram_step_expr(prev, F.col("__toks"), n))
    paras = F.filter(
        F.transform(F.split(safe, r"\n\n", -1), lambda p: F.trim(p)),
        lambda p: F.length(p) > 0,
    )
    return staged.withColumn("__sp", F.array_sort(paras))


def repetition_stat_cols() -> dict[str, Column]:
    """The 11 repetition stat expressions over the staged ATTRIBUTES from
    `stage_repetition_chain` (__tc, __g2..__g10, __sp)."""
    tc = F.col("__tc")
    cols = {}
    for n in (2, 3, 4):
        cols[f"top_{n}gram_char_frac"] = F.round(
            F.least(_top_gram_chars(F.array_sort(F.col(f"__g{n}"))) / tc,
                    F.lit(1.0)), 6)
    for n in range(5, 11):
        cols[f"dup_{n}gram_char_frac"] = F.round(
            F.least(_dup_gram_chars(F.array_sort(F.col(f"__g{n}"))) / tc,
                    F.lit(1.0)), 6)
    sp = F.col("__sp")
    n_paras = F.greatest(F.size(sp).cast("double"), F.lit(1.0))
    dup_para_count = F.aggregate(
        sp,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("d")),
        lambda a, p: F.struct(
            p.alias("prev"),
            (a["d"] + F.when(p == a["prev"], 1).otherwise(0)).alias("d"),
        ),
    )["d"].cast("double")
    cols["dup_para_frac"] = F.round(dup_para_count / n_paras, 6)
    cols["dup_para_char_frac"] = F.round(
        F.least(_dup_gram_chars(sp) / tc, F.lit(1.0)), 6)
    return cols


def repetition_keep_expr() -> Column:
    """`repetition_keep` from the (rounded) stat ATTRIBUTES — apply in a
    select AFTER the stats are projected (CollapseProject rule #2 in the
    with_repetition_features docstring)."""
    keep = F.lit(True)
    for n, thr in REPETITION_TOP_THRESHOLDS.items():
        keep = keep & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in REPETITION_DUP_THRESHOLDS.items():
        keep = keep & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return keep & (F.col("dup_para_frac") <= 0.30) \
        & (F.col("dup_para_char_frac") <= 0.20)
