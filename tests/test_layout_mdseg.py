"""XY-cut reading order (W3) and markdown segmentation (X7) — kernel units
plus Spark-operator equality with the kernel."""

from pyspark.sql import functions as F

from rag_pdf_parser_spark.kernel.layout import make_boxes, sort_boxes
from rag_pdf_parser_spark.kernel.mdseg import segment_markdown
from rag_pdf_parser_spark.operators.layout import (
    segment_markdown_docs,
    synth_boxes,
    xy_cut_order,
)


class TestSortBoxes:
    def test_empty(self):
        assert sort_boxes([], 1000) == []

    def test_band_sort_top_down_left_right(self):
        # same 10px band → left-to-right; different bands → top-down
        lines = [
            {"line_id": 0, "box": [500, 100, 600, 112]},
            {"line_id": 1, "box": [100, 103, 200, 115]},  # same band, left
            {"line_id": 2, "box": [100, 50, 200, 62]},    # above
        ]
        out = [l["line_id"] for l in sort_boxes(lines, 1000)]
        assert out == [2, 1, 0]

    def test_two_column_split(self):
        # >10 lines, clear left/right columns with full vertical overlap →
        # read left column fully, then right (extractor.py:334-349)
        lines = []
        for i in range(6):
            lines.append({"line_id": i, "box": [100, 100 + i * 50, 400, 120 + i * 50]})
        for i in range(6):
            lines.append({"line_id": 10 + i, "box": [600, 100 + i * 50, 900, 120 + i * 50]})
        out = [l["line_id"] for l in sort_boxes(lines, 1000)]
        assert out == [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15]

    def test_no_split_when_no_overlap(self):
        # left column on top, right column below → <30% overlap → band sort
        lines = []
        for i in range(6):
            lines.append({"line_id": i, "box": [100, 100 + i * 30, 400, 115 + i * 30]})
        for i in range(6):
            lines.append({"line_id": 10 + i, "box": [600, 600 + i * 30, 900, 615 + i * 30]})
        out = [l["line_id"] for l in sort_boxes(lines, 1000)]
        assert out == [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15]

    def test_stable_on_ties(self):
        lines = [
            {"line_id": 0, "box": [100, 100, 200, 110]},
            {"line_id": 1, "box": [100, 100, 200, 110]},  # identical box
        ]
        out = [l["line_id"] for l in sort_boxes(lines, 1000)]
        assert out == [0, 1]

    def test_deterministic_fixture(self):
        a, wa = make_boxes(7)
        b, wb = make_boxes(7)
        assert a == b and wa == wb


class TestSegmentMarkdown:
    def test_empty(self):
        assert segment_markdown("") == []
        assert segment_markdown("   \n  ") == []

    def test_headings(self):
        out = segment_markdown("# Top\n\n## Sub\n\nbody text")
        assert [(b["type"], b["text"]) for b in out] == [
            ("title", "Top"), ("section_header", "Sub"), ("text", "body text"),
        ]
        assert out[1]["markdown"] == "## Sub"

    def test_figure_and_formula(self):
        out = segment_markdown("![cap](img.png)\n\n$$ x^2 $$\n\n![](y.png)")
        assert [(b["type"], b["text"]) for b in out] == [
            ("figure", "cap"), ("formula", "x^2"), ("figure", "[Figure]"),
        ]

    def test_table_accumulation_and_separator_strip(self):
        md = "before\n| a | b |\n|---|---|\n| 1 | 2 |\nafter"
        out = segment_markdown(md)
        assert [b["type"] for b in out] == ["text", "table", "text"]
        # separator row dropped, cells joined ' | ' (qwen_parser.py:525-533)
        assert out[1]["text"] == "a | b\n1 | 2"

    def test_paragraph_accumulation_over_blank_lines(self):
        out = segment_markdown("line one\nline two\n\nnext para")
        assert [b["text"] for b in out] == ["line one\nline two", "next para"]

    def test_reading_order_sequential(self):
        out = segment_markdown("# A\n\npara\n\n## B\n\npara2")
        assert [b["reading_order"] for b in out] == [0, 1, 2, 3]


def test_xy_cut_operator_matches_kernel(spark):
    boxes = synth_boxes(spark, 40)
    got = {}
    for r in xy_cut_order(boxes).collect():
        got.setdefault(r["doc_id"], {})[r["line_id"]] = r["reading_order"]
    for d in range(40):
        lines, width = make_boxes(d)
        expect = {l["line_id"]: i for i, l in enumerate(sort_boxes(lines, width))}
        assert got[d] == expect, d


def test_mdseg_operator_matches_kernel(spark, pages_df, golden_docs):
    # run segmentation over each golden doc's extracted markdown-ish text
    rows = [(i, g["extracted_text"])
            for i, g in enumerate(golden_docs.values())][:50]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in segment_markdown_docs(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for i, (did, text) in enumerate(rows):
        expect = segment_markdown(text)
        have = sorted(got.get(did, []), key=lambda r: r["reading_order"])
        assert len(have) == len(expect), did
        for h, e in zip(have, expect):
            assert (h["type"], h["text"], h["markdown"]) == (
                e["type"], e["text"], e["markdown"])


class TestTranslateSlot:
    def test_dict_translate(self, spark):
        from rag_pdf_parser_spark.operators.translate import dict_translate_expr

        df = spark.createDataFrame(
            [("데이터 엔진 unknown 모델",), ("plain english text",)],
            "text string")
        got = [r["t"] for r in df.select(
            dict_translate_expr(F.col("text")).alias("t")).collect()]
        assert got[0] == "data engine unknown model"
        assert got[1] == "plain english text"

    def test_bilingual_interleave(self, spark):
        from rag_pdf_parser_spark.operators.translate import bilingual_interleave

        df = spark.createDataFrame(
            [("b1", "ko", "데이터 모델"), ("b2", "en", "hello world")],
            "block_id string, lang string, text string")
        rows = {r["block_id"]: r for r in bilingual_interleave(df).collect()}
        assert rows["b1"]["bilingual"] == "데이터 모델\n\n*data model*"
        assert rows["b1"]["translation"] == "data model"
        assert rows["b2"]["bilingual"] == "hello world"
        assert rows["b2"]["translation"] is None

    def test_bilingual_markdown_expr_equals_twin(self, spark):
        """Paragraph-aware whole-document bilingual rendering
        (translator.py:260-318 semantics): the pure-expression fold must
        byte-match the Python twin on every special-line kind — headings,
        images, comments, '*AI ' annotations, tables, fences, quotes, blank
        runs, trailing paragraphs, empty docs."""
        from rag_pdf_parser_spark.operators.translate import (
            bilingual_markdown_expr, bilingual_markdown_py)

        samples = [
            "# Title\n\n데이터 엔진 is fast\nsecond line\n\n| a | b |\n"
            "| 1 | 2 |\n\n```\ncode 데이터\n```\n> quote\n*AI caption*\n"
            "tail para 분석",
            "plain only 数据 提取",
            "",
            "\n\n",
            "# only special\n![img](x)\n<!-- c -->",
            "para1\n\npara2 검증\n",
            "   \nindented ok\n\t\nafter tab-blank",
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(samples)], "i int, md string")
        got = {r["i"]: r["b"] for r in df.select(
            "i", bilingual_markdown_expr(F.col("md")).alias("b")).collect()}
        for i, s in enumerate(samples):
            assert got[i] == bilingual_markdown_py(s), (i, got[i])

    def test_bilingual_markdown_translates_paragraphs_only(self, spark):
        from rag_pdf_parser_spark.operators.translate import (
            bilingual_markdown_expr)

        md = "# 데이터\n\n데이터 모델"
        out = spark.createDataFrame([(md,)], "md string").select(
            bilingual_markdown_expr(F.col("md")).alias("b")).collect()[0]["b"]
        # heading passes through untranslated; paragraph gains the quote block
        assert out == "# 데이터\n\n데이터 모델\n\n> *data model*\n"

    def test_bilingual_markdown_random_fuzz(self, spark):
        """Random markdown-ish documents, batched into ONE DataFrame pass —
        expression must byte-match the Python twin on every sample."""
        import random

        from rag_pdf_parser_spark.operators.translate import (
            bilingual_markdown_expr, bilingual_markdown_py)

        rng = random.Random(11)
        frags = ["# H", "## Sub", "plain text 데이터", "모델 학습 data",
                 "| a | b |", "> quoted", "```", "code x", "![i](u)",
                 "<!-- c -->", "*AI note*", "", "   ", "\ttab lead",
                 "- bullet", "end.", "line two 处理"]
        samples = ["\n".join(rng.choice(frags)
                             for _ in range(rng.randint(0, 25)))
                   for _ in range(200)]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(samples)], "i int, md string")
        got = {r["i"]: r["b"] for r in df.select(
            "i", bilingual_markdown_expr(F.col("md")).alias("b")).collect()}
        bad = [i for i, s in enumerate(samples)
               if got[i] != bilingual_markdown_py(s)]
        assert not bad, (bad[:3], samples[bad[0]] if bad else None)
