"""Minimal deterministic PDF text-layout lane (pure stdlib: re + zlib).

The reference's primary input is PDF (fitz/PaddleOCR/Qwen-VL,
ir_processor.py:96-264); per the north rule those model calls become a
rule-based layout parse: extract positioned text runs from the content
streams, sort them into reading order with the column-aware XY kernel
(kernel.layout.sort_boxes ≡ extractor.py:304-356), band them into blocks,
and type them by font size.

Scope: the well-formed subset our deterministic generator (make_pdf) emits —
FlateDecode or plain content streams, `BT /F<n> <size> Tf <x> <y> Td
(<text>) Tj ET` text objects, one content stream per page. Real-world PDF
coverage would swap in pdfminer (not in this image) behind the same
function signature; the Spark-side plumbing (schema, dispatch, batching) is
identical either way — exactly how SURVEY §2.9 frames the parser registry.

Output block schema matches the HTML lane (htmlx.extract_document) so both
lanes share every downstream operator.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

from .htmlx import (
    PARSER_VERSION,
    anchor_for,
    content_hash,
    doc_id_for,
    line_spans,
)
from .lang import detect_language
from .layout import sort_boxes

PAGE_W, PAGE_H = 612.0, 792.0  # US Letter points

# tempered dict match: the stream's OWN << ... >> (no nested <<), so
# FlateDecode detection never reads a neighboring object's dict
_STREAM_RE = re.compile(
    rb"<<((?:(?!<<|>>).)*)>>\s*stream\r?\n(.*?)endstream", re.S
)
_TEXT_RUN_RE = re.compile(
    rb"BT\s+/F(\d+)\s+([\d.]+)\s+Tf\s+([\d.]+)\s+([\d.]+)\s+Td\s*"
    rb"\((.*?)(?<!\\)\)\s*Tj\s+ET",
    re.S,
)


def _unescape(raw: bytes) -> str:
    """PDF string unescape for \\( \\) \\\\ — manual scan (re.sub treats a
    lone backslash replacement as a broken template)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0x5C and i + 1 < n and raw[i + 1] in (0x28, 0x29, 0x5C):
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(b)
            i += 1
    return out.decode("latin-1")


def extract_pdf_document(raw: Optional[bytes]) -> dict:
    """PDF bytes → same result dict shape as htmlx.extract_document."""
    raw = bytes(raw) if raw is not None else b""
    doc_id = doc_id_for(raw)
    failure = None
    pages_runs: list[list[dict]] = []
    if not raw:
        failure = "EMPTY_PDF"
    elif not raw.startswith(b"%PDF"):
        failure = "NOT_PDF"
    else:
        try:
            for dict_part, body in _STREAM_RE.findall(raw):
                if b"FlateDecode" in dict_part:
                    body = zlib.decompress(body.rstrip(b"\r\n"))
                runs = []
                for font, size, x, y, text in _TEXT_RUN_RE.findall(body):
                    size_f = float(size)
                    txt = _unescape(text)
                    x0, y0 = float(x), float(y)
                    # PDF y grows upward; reading order wants y downward
                    y_top = PAGE_H - y0 - size_f
                    w = max(1.0, 0.5 * size_f * len(txt))
                    runs.append({
                        "text": txt,
                        "font_size": size_f,
                        "box": [x0, y_top, x0 + w, y_top + size_f],
                    })
                if runs:
                    pages_runs.append(runs)
        except Exception:  # noqa: BLE001 — any malformed stream = failure code
            failure = "PARSE_ERROR"
            pages_runs = []
    if not pages_runs and failure is None:
        failure = "NO_CONTENT"

    blocks: list[dict] = []
    per_page_counter: dict[int, int] = {}
    order = 0
    for pno, runs in enumerate(pages_runs, start=1):
        ordered = sort_boxes(runs, PAGE_W)
        # band consecutive same-font runs into blocks (paragraph grouping)
        grouped: list[list[dict]] = []

        def _top(run):  # sort_boxes normalizes boxes to 4-point polygons
            return min(p[1] for p in run["box"])

        def _bottom(run):
            return max(p[1] for p in run["box"])

        for r in ordered:
            if (grouped and grouped[-1][0]["font_size"] == r["font_size"]
                    and abs(_top(r) - _bottom(grouped[-1][-1])) < 8.0
                    and r["font_size"] <= 12.0):
                grouped[-1].append(r)
            else:
                grouped.append([r])
        for g in grouped:
            size = g[0]["font_size"]
            btype = ("title" if size >= 18.0
                     else "section_header" if size >= 14.0 else "text")
            text = " ".join(r["text"] for r in g).strip()
            if not text:
                continue
            idx = per_page_counter.get(pno, 0)
            per_page_counter[pno] = idx + 1
            md = (f"# {text}" if btype == "title"
                  else f"## {text}" if btype == "section_header" else text)
            blocks.append({
                "page": pno,
                "block_id": f"p{pno}_b{idx}",
                "type": btype,
                "reading_order": order,
                "text": text,
                "markdown": md,
                "caption": None,  # PDF lane emits text-ish types only
                "lang": detect_language(text),
                "span_start": 0,
                "span_end": 0,
                "anchor": anchor_for(pno, btype, order),
                "content_hash": content_hash(text),
                "lines": [],
            })
            order += 1

    # assembled text + spans (same '\n\n' join semantics as the HTML lane)
    extracted = "\n\n".join(b["text"] for b in blocks)
    cursor = 0
    for b in blocks:
        start = extracted.find(b["text"], cursor)
        b["span_start"] = start
        b["span_end"] = start + len(b["text"])
        b["lines"] = line_spans(b["text"], start)
        cursor = b["span_end"]

    title = next((b["text"] for b in blocks if b["type"] == "title"), None)
    return {
        "doc_id": doc_id,
        "charset": "binary",
        "failure_code": failure,
        "title": title,
        "authors": [],  # PDF lane: no metadata dictionary parse (stdlib scope)
        "parser_version": PARSER_VERSION,
        "n_pages": max(len(pages_runs), 1),
        "extracted_text": extracted,
        "blocks": blocks,
    }


# --- deterministic synthetic PDF generator -----------------------------------

def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(doc_index: int, seed: int = 42) -> bytes:
    """Tiny valid PDF, pure function of (seed, doc_index): 1-2 pages of
    positioned text lines (title 20pt, section headers 15pt, body 12pt),
    optionally two-column body, FlateDecode-compressed streams half the
    time."""
    import random

    rng = random.Random(seed * 9_999_991 + doc_index)
    words = ("spark engine page layout stream column extract block chunk "
             "table order merge batch row data").split()

    def line(x, y, size, text):
        return f"BT /F1 {size} Tf {x:.1f} {y:.1f} Td ({_esc(text)}) Tj ET"

    n_pages = rng.randint(1, 2)
    page_streams = []
    for _ in range(n_pages):
        ops = []
        y = PAGE_H - 60
        ops.append(line(72, y, 20, " ".join(
            rng.choice(words).capitalize() for _ in range(3))))
        y -= 40
        two_col = rng.random() < 0.4
        for s in range(rng.randint(1, 2)):
            ops.append(line(72, y, 15, f"Section {s + 1} "
                            + rng.choice(words)))
            y -= 24
            n_lines = rng.randint(4, 12)
            for i in range(n_lines):
                body = " ".join(rng.choice(words) for _ in range(6))
                if two_col:
                    x = 72 if i % 2 == 0 else 320
                    yy = y - (i // 2) * 16
                else:
                    x = 72
                    yy = y - i * 16
                ops.append(line(x, yy, 12, body))
            y -= (n_lines // (2 if two_col else 1) + 2) * 16
        content = ("\n".join(ops)).encode("latin-1")
        if rng.random() < 0.5:
            page_streams.append((zlib.compress(content, 6), True))
        else:
            page_streams.append((content, False))

    # assemble objects: catalog(1) pages(2) font(3), then per page: page obj
    # + content obj
    objs: list[bytes] = []
    page_ids = []
    next_id = 4
    for content, flate in page_streams:
        page_ids.append(next_id)
        next_id += 2
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    bodies: list[bytes] = []
    for i, (content, flate) in enumerate(page_streams):
        pid = page_ids[i]
        bodies.append((pid, (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {int(PAGE_W)} "
            f"{int(PAGE_H)}] /Contents {pid + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()))
        filt = b"/Filter /FlateDecode " if flate else b""
        bodies.append((pid + 1,
                       b"<< " + filt + f"/Length {len(content)} >>".encode()
                       + b"\nstream\n" + content + b"\nendstream"))

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid, body in [(1, objs[0]), (2, objs[1]), (3, objs[2])] + bodies:
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + (
            body if isinstance(body, bytes) else body) + b"\nendobj\n"
    xref_at = len(out)
    n = max(offsets) + 1
    out += f"xref\n0 {n}\n0000000000 65535 f \n".encode()
    for oid in range(1, n):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n"
            "%%EOF").encode()
    return bytes(out)
