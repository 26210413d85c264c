"""Property-based tests (hypothesis) — invariants the reference never
checked (SURVEY §5: 'no property-based tests' in the reference)."""

import re

from pyspark.sql import functions as F

from hypothesis import given, settings
from hypothesis import strategies as st

from rag_pdf_parser_spark.kernel import (
    ChunkingConfig,
    chunk_blocks,
    detect_language,
    estimate_tokens,
    extract_document,
)
from rag_pdf_parser_spark.kernel.htmlx import decode_html
from rag_pdf_parser_spark.kernel.mdseg import segment_markdown

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_lang_detect_total_and_deterministic(s):
    out = detect_language(s)
    assert out in ("ko", "zh", "en", "unknown")
    assert detect_language(s) == out


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_token_estimate_bounds(s):
    n = estimate_tokens(s)
    assert 0 <= n <= len(s)  # cjk/1.5 and other/4 both <= 1 token per char


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2000))
def test_extract_never_raises_and_is_deterministic(raw):
    a = extract_document(raw)
    b = extract_document(raw)
    assert a == b
    assert a["doc_id"] == b["doc_id"] and len(a["doc_id"]) == 16
    # blocks always carry consistent reading order 0..n-1
    assert [blk["reading_order"] for blk in a["blocks"]] == list(
        range(len(a["blocks"]))
    )


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1000))
def test_decode_total(raw):
    text, charset, failure = decode_html(raw)
    assert isinstance(text, str)
    assert failure in (None, "EMPTY_HTML", "OVERSIZE_TRUNCATED")


_BLOCK_TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=1, max_size=120,
).filter(lambda s: s.strip())


@st.composite
def block_lists(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    blocks = []
    for i in range(n):
        btype = draw(st.sampled_from(
            ["text", "text", "text", "section_header", "title", "table"]))
        text = draw(_BLOCK_TEXT)
        blocks.append({
            "page": 1 + i // 10,
            "block_id": f"p{1 + i // 10}_b{i}",
            "type": btype,
            "reading_order": i,
            "text": text,
            "markdown": text,
            "anchor": f"[@p{1 + i // 10}_x{i}]",
        })
    return blocks


@settings(max_examples=150, deadline=None)
@given(block_lists(), st.integers(min_value=5, max_value=60),
       st.integers(min_value=0, max_value=10))
def test_chunker_invariants(blocks, chunk_size, overlap):
    cfg = ChunkingConfig(chunk_size=chunk_size, overlap_tokens=overlap,
                         min_chunk_size=2, max_chunk_size=chunk_size * 2)
    chunks = chunk_blocks(blocks, "d" * 16, cfg)
    assert chunks, "non-empty input must yield at least one chunk"
    all_ids = [b["block_id"] for b in blocks]
    covered = set()
    prev_order_start = -1
    for i, c in enumerate(chunks):
        assert c["chunk_id"] == f"dddddddd_c{i}"
        assert c["block_ids"], "chunks are never empty"
        assert set(c["block_ids"]) <= set(all_ids)
        assert c["reading_order_start"] <= c["reading_order_end"]
        assert c["reading_order_start"] >= prev_order_start
        prev_order_start = c["reading_order_start"]
        assert c["char_count"] == len(c["text"])
        covered.update(c["block_ids"])
    # every block lands in some chunk (overlap may duplicate, never drop)
    assert covered == set(all_ids)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=500))
def test_mdseg_total_and_ordered(md):
    blocks = segment_markdown(md)
    assert [b["reading_order"] for b in blocks] == list(range(len(blocks)))
    for b in blocks:
        assert b["type"] in ("text", "title", "section_header", "table",
                             "figure", "formula")
    # non-whitespace input yields at least one block when it has a
    # non-table, non-blank line
    if any(ln.strip() and not re.match(r"^\|[\s\-|]+\|$", ln.strip())
           for ln in md.split("\n")):
        assert blocks


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=3000))
def test_lines_and_captions_invariants(raw):
    """Round-2 fields: line spans ordered/contained; captions only on
    visual/structural types and well-formed."""
    d = extract_document(raw)
    for b in d["blocks"]:
        prev_end = None
        for l in b["lines"]:
            assert b["span_start"] <= l["start"] < l["end"], b["block_id"]
            assert l["end"] <= b["span_end"]
            if prev_end is not None:
                assert l["start"] > prev_end
            prev_end = l["end"]
        if b["type"] in ("figure", "chart", "table", "formula"):
            assert b["caption"] and b["caption"][0].isupper()
        else:
            assert b["caption"] is None
    assert isinstance(d["authors"], list)
    assert d["parser_version"]


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=500))
def test_avg_hash_total_and_stable(raw):
    from rag_pdf_parser_spark.kernel.imagex import avg_hash_64, fake_decode_gray

    px = fake_decode_gray(raw)
    assert len(px) == 64 * 64 and all(0 <= v <= 255 for v in px)
    h = avg_hash_64(px)
    assert len(h) == 16 and int(h, 16) >= 0
    assert avg_hash_64(fake_decode_gray(raw)) == h


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_xxh_twin_never_collides_with_type_confusion(a, b):
    """spark_xxhash64 is a pure function; equal inputs hash equal, and the
    chained form differs from the single form unless by (rare) collision."""
    from rag_pdf_parser_spark.kernel.xxh import spark_xxhash64

    assert spark_xxhash64(a) == spark_xxhash64(a)
    assert spark_xxhash64(a, b) == spark_xxhash64(a, b)


class TestGopherQuality:
    """Gopher/C4 quality expressions vs an independent per-string Python
    twin (the driver query webtext_quality additionally has a full DuckDB
    twin; line-level features have no driver slot so this is their gate)."""

    TEXTS = [
        "The quick brown fox jumps over the lazy dog. " * 12,
        "short",
        "# # # # # spam spam spam spam spam " * 10,
        "- bullet one\n- bullet two\nplain line.\nAnother line!\n\n"
        "trailing ellipsis...\nsame\nsame\nsame",
        "word " * 60,
        "lorem ipsum dolor { code(); }",
        "",
        "一 二 三 四 五 multi 语言 mixed text here now",
    ]

    @staticmethod
    def _py_line_feats(t):
        import re
        lines = [l for l in t.split("\n") if l.strip(" ")]
        n = max(len(lines), 1.0)
        dups = len(lines) - len(set(lines))
        bullet = sum(1 for l in lines if re.match(r"^[-*•]", l.strip(" ")))
        ell = sum(1 for l in lines
                  if re.search(r"(\.\.\.|…)[ \t\x0b\f\r]*$", l))
        term = sum(1 for l in lines
                   if re.search(r'[.!?"][ \t\x0b\f\r]*$', l))
        return (len(lines), round(dups / n, 6), round(bullet / n, 6),
                round(ell / n, 6), round(term / n, 6))

    def test_line_features_match_python_twin(self, spark):
        from rag_pdf_parser_spark.functions import line_features_expr

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "i int, text string")
        feats = line_features_expr(F.col("text"))
        rows = {r["i"]: r for r in df.select(
            "i", *[c.alias(k) for k, c in feats.items()]).collect()}
        for i, t in enumerate(self.TEXTS):
            n_lines, dup, bullet, ell, term = self._py_line_feats(t)
            r = rows[i]
            assert r["n_lines"] == n_lines, (i, r)
            assert r["dup_line_frac"] == dup, (i, r)
            assert r["frac_bullet_lines"] == bullet, (i, r)
            assert r["frac_ellipsis_lines"] == ell, (i, r)
            assert r["frac_lines_term_punct"] == term, (i, r)

    def test_gopher_keep_sanity(self, spark):
        from rag_pdf_parser_spark.functions import gopher_features_expr

        df = spark.createDataFrame(
            [(0, "The quick brown fox jumps over the lazy dog. " * 12),
             (1, "# # # spam " * 30),
             (2, "short text")],
            "i int, text string")
        feats = gopher_features_expr(F.col("text"))
        rows = {r["i"]: r for r in df.select(
            "i", *[c.alias(k) for k, c in feats.items()]).collect()}
        assert rows[0]["gopher_keep"] is True, rows[0]
        # symbol-ratio and repetition kill the spam doc
        assert rows[1]["gopher_keep"] is False, rows[1]
        assert rows[1]["top_bigram_frac"] > 0.2 or \
            rows[1]["symbol_word_ratio"] >= 0.1
        # too short
        assert rows[2]["gopher_keep"] is False


def test_round_half_up_twin_matches_spark(spark):
    """kernel.twins.round_half_up claims Spark F.round semantics
    (BigDecimal HALF_UP over the shortest decimal repr). Verify over
    adversarial values — halfway points, float-noise neighbors, negatives,
    and pseudo-random cosines — in one batched DataFrame pass."""
    import random

    from rag_pdf_parser_spark.kernel.twins import round_half_up

    vals = [0.12345, 0.123450000001, 0.123449999999, -0.12345, 0.99995,
            -0.99995, 0.5e-4, 1.00005, 0.0, 1.0, -1.0, 0.93215, 0.93225]
    rng = random.Random(3)
    vals += [rng.uniform(-1, 1) for _ in range(500)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, v double")
    got = {r["i"]: r["r"] for r in df.select(
        "i", F.round("v", 4).alias("r")).collect()}
    bad = [(v, got[i], round_half_up(v, 4)) for i, v in enumerate(vals)
           if got[i] != round_half_up(v, 4)]
    assert not bad, bad[:5]


def test_float32_and_cosine_twins_match_spark(spark):
    """The other legs of the chunk-knn golden: _f32 must equal Spark's
    float cast bit-for-bit, and cosine_seq must equal cosine_expr exactly
    (same IEEE operation order) over random float32 vectors."""
    import random

    from rag_pdf_parser_spark.functions import cosine_expr
    from rag_pdf_parser_spark.kernel.twins import _f32, cosine_seq

    rng = random.Random(9)
    vals = [rng.uniform(-10, 10) for _ in range(300)] + [0.1, 1e-40, -1e-40]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, v double")
    got = {r["i"]: r["f"] for r in df.select(
        "i", F.col("v").cast("float").cast("double").alias("f")).collect()}
    bad = [(v, got[i], _f32(v)) for i, v in enumerate(vals)
           if got[i] != _f32(v)]
    assert not bad, bad[:5]

    vecs = [([rng.uniform(-1, 1) for _ in range(32)],
             [rng.uniform(-1, 1) for _ in range(32)]) for _ in range(50)]
    vdf = spark.createDataFrame(
        [(i, [_f32(x) for x in a], [_f32(x) for x in b])
         for i, (a, b) in enumerate(vecs)],
        "i int, a array<float>, b array<float>")
    gotc = {r["i"]: r["c"] for r in vdf.select(
        "i", cosine_expr(F.col("a"), F.col("b")).alias("c")).collect()}
    badc = [i for i, (a, b) in enumerate(vecs)
            if gotc[i] != cosine_seq([_f32(x) for x in a],
                                     [_f32(x) for x in b])]
    assert not badc, badc[:5]


def test_hash_embedding_twin_matches_spark(spark):
    """hash_embedding + l2_normalize twins vs the Spark expressions over
    adversarial strings (unicode ws, CJK, empties, repeated tokens)."""
    from rag_pdf_parser_spark.functions import (hash_embedding_expr,
                                                l2_normalize_expr)
    from rag_pdf_parser_spark.kernel.twins import (hash_embedding,
                                                   l2_normalize_f32)

    texts = ["hello world hello", "  spaced\t tokens \n lines ",
             "数据 引擎 data 数据", "", "one", "a " * 100,
             "MiXeD CaSe MIXED case", "punct, here! and; there?"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    vec = F.transform(l2_normalize_expr(hash_embedding_expr(F.col("text"))),
                      lambda v: v.cast("float"))
    got = {r["i"]: list(r["v"]) for r in df.select(
        "i", vec.alias("v")).collect()}
    for i, t in enumerate(texts):
        exp = l2_normalize_f32(hash_embedding(t))
        assert got[i] == exp, (i, t, got[i][:4], exp[:4])


def test_quality_model_twin_matches_spark_adversarial(spark):
    """quality_model score twin vs the Spark fold, BIT-exact, over
    adversarial strings: unicode whitespace (Java \\s is ASCII — the twin
    must tokenize identically), CJK, repeated tokens, punctuation-only,
    long texts, NULL."""
    from rag_pdf_parser_spark.functions import with_quality_model
    from rag_pdf_parser_spark.kernel.twins import quality_model_score

    texts = ["hello world hello", "  spaced\t tokens \n lines ",
             "数据 引擎 data 数据", "", "one", "a " * 300,
             "MiXeD CaSe MIXED case", "punct, here! and; there?",
             " nbsp separated words",  # NBSP is NOT \s in Java
             "　ideographic　space", "word​zero​width",
             ".!?", "x" * 500, None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {r["i"]: r["score_lin"]
           for r in with_quality_model(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == quality_model_score(t), (i, repr(t))
