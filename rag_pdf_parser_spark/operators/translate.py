"""Translation slot (M6) — deterministic dictionary stub + bilingual interleave.

The reference translates paragraph-by-paragraph via Ollama and interleaves
original/translated paragraphs (translator.py:42-109 request loop,
211-258 interleave). Per the north rule the model call is replaced by a
deterministic rule occupying the same dataflow slot:

- `dict_translate_expr`: token-wise dictionary mapping for a small fixed
  ko/zh→en lexicon (the datagen vocabulary), unknown tokens passed through
  unchanged — a pure native expression (transform over the token array);
- `bilingual_interleave`: the reference's interleave is pure formatting —
  original paragraph, blank line, *translated* paragraph in italics —
  reproduced exactly as concat expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed deterministic lexicon (datagen vocabulary, kernel/datagen.py)
LEXICON = {
    "데이터": "data", "엔진": "engine", "문서": "document", "추출": "extract",
    "파이프라인": "pipeline", "분산": "distributed", "처리": "processing",
    "속도": "speed", "검증": "verification", "결과": "result",
    "시스템": "system", "분석": "analysis", "언어": "language",
    "모델": "model", "학습": "training",
    "数据": "data", "引擎": "engine", "文档": "document", "提取": "extract",
    "管道": "pipeline", "分布": "distributed", "处理": "processing",
    "速度": "speed", "验证": "verification", "结果": "result",
    "系统": "system", "分析": "analysis", "语言": "language",
    "模型": "model", "学习": "training",
}


def dict_translate_expr(text: Column) -> Column:
    """Whitespace-token dictionary translation; unknown tokens unchanged.
    Pure expression: split → transform(element_at(map)) → concat_ws."""
    pairs = []
    for k, v in sorted(LEXICON.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    lex = F.create_map(*pairs)
    toks = F.split(text, r"\s+")
    translated = F.transform(toks, lambda t: F.coalesce(lex[t], t))
    return F.concat_ws(" ", translated)


def bilingual_interleave(blocks: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-block bilingual rendering (translator.py:211-258 interleave
    shape): original, blank line, *translation* italicized. Only applied to
    non-'en' blocks; English blocks pass through."""
    tr = dict_translate_expr(F.col(text_col))
    out = F.when(
        F.col("lang").isin("ko", "zh"),
        F.concat(F.col(text_col), F.lit("\n\n*"), tr, F.lit("*")),
    ).otherwise(F.col(text_col))
    return blocks.withColumn("bilingual", out).withColumn(
        "translation", F.when(F.col("lang").isin("ko", "zh"), tr)
    )
