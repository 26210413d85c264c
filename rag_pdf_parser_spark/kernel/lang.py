"""Character-class language detection.

Reproduces the reference's rule semantics (char-distribution thresholds,
/root/reference/src/text/extractor.py:358-387): count Hangul syllables,
CJK-unified ideographs, and ASCII letters; classify

    ko  if hangul/total  > 0.3
    zh  if chinese/total > 0.3
    en  if ascii_alpha/total > 0.5
    unknown otherwise (and for empty text / total == 0)

The identical rule is also expressed as native Spark SQL expressions in
``rag_pdf_parser_spark.functions.lang_expr`` — this Python version exists for
the kernel oracle and for unit cross-checks against the expression form.
"""

from __future__ import annotations

HANGUL_LO, HANGUL_HI = "\uac00", "\ud7af"
CJK_LO, CJK_HI = "\u4e00", "\u9fff"


def detect_language(text: str) -> str:
    if not text:
        return "unknown"
    korean = 0
    chinese = 0
    ascii_alpha = 0
    for c in text:
        if HANGUL_LO <= c <= HANGUL_HI:
            korean += 1
        elif CJK_LO <= c <= CJK_HI:
            chinese += 1
        elif c.isascii() and c.isalpha():
            ascii_alpha += 1
    total = korean + chinese + ascii_alpha
    if total == 0:
        return "unknown"
    if korean / total > 0.3:
        return "ko"
    if chinese / total > 0.3:
        return "zh"
    if ascii_alpha / total > 0.5:
        return "en"
    return "unknown"
