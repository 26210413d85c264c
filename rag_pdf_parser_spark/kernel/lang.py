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

import re

HANGUL_LO, HANGUL_HI = "\uac00", "\ud7af"
CJK_LO, CJK_HI = "\u4e00", "\u9fff"

# Regex counting is C-speed (a per-char Python loop was ~20% of the whole
# extraction kernel under profile); classes match the reference's ranges
# exactly: Hangul syllables, CJK unified ideographs, ASCII letters
# (c.isascii() and c.isalpha() \u21d4 [A-Za-z]).
_HANGUL_RE = re.compile(f"[{HANGUL_LO}-{HANGUL_HI}]")
_CJK_RE = re.compile(f"[{CJK_LO}-{CJK_HI}]")
_ASCII_ALPHA_RE = re.compile("[A-Za-z]")


def detect_language(text: str) -> str:
    if not text:
        return "unknown"
    korean = len(_HANGUL_RE.findall(text))
    chinese = len(_CJK_RE.findall(text))
    ascii_alpha = len(_ASCII_ALPHA_RE.findall(text))
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
