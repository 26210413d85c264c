"""Token-count estimator.

Reproduces the reference's "simple" estimator semantics
(/root/reference/src/models/chunk.py:92-108): CJK chars (unified ideographs,
Hangul syllables, hiragana, katakana) cost 1/1.5 token each, everything else
1/4, truncated to int.

Also expressed as a native Spark expression in
``rag_pdf_parser_spark.functions.token_estimate_expr`` (no UDF on the hot
path); this Python twin serves the kernel oracle and chunker.
"""

from __future__ import annotations

import re

_CJK_RE = re.compile("[\u4e00-\u9fff\uac00-\ud7af\u3040-\u309f\u30a0-\u30ff]")


def estimate_tokens(text: str) -> int:
    cjk = len(_CJK_RE.findall(text))
    other = len(text) - cjk
    return int(cjk / 1.5 + other / 4)
