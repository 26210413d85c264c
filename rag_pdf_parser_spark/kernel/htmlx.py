"""HTML main-content extraction kernel (pure Python, stdlib only).

This is the engine's analog of the reference's page→blocks layout parse
(/root/reference/src/layout/base_parser.py:17-88 interface;
/root/reference/src/layout/qwen_parser.py:242-268 block emission) re-targeted
at HTML per the north rule: link-density + text-density boilerplate stripping
(Readability/trafilatura-style rules), typed block emission with reading
order, span offsets, markdown rendering, and deterministic charset decoding.

Output block schema mirrors the reference's IRBlock
(/root/reference/src/models/block.py:25-60):
``(page, block_id, type, reading_order, text, markdown, lang, span_start,
span_end, anchor, content_hash)`` with pixel bboxes replaced by character
span offsets into the assembled document text (FIXTURES.md §2).

Everything is deterministic: stdlib ``html.parser`` (no version-floating
third-party parser), fixed charset-sniff policy, stable ordering.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import (HTMLParser, attrfind_tolerant, endtagfind,
                         locatestarttagend_tolerant, tagfind_tolerant)
from typing import Optional

from .lang import detect_language
from .pagemerge import merge_kind

# --- constants ---------------------------------------------------------------

# Subtrees never contributing content (chrome / non-text).
DROP_TAGS = frozenset(
    "script style noscript template svg head nav aside form button select "
    "option iframe object embed canvas audio video map area".split()
)
# Page chrome containers stripped entirely (reference marks header/footer
# block types as boilerplate, src/processing/ir_processor.py:36-39).
CHROME_TAGS = frozenset("header footer".split())

# Elements that open a candidate content block.
BLOCK_TAGS = frozenset(
    "h1 h2 h3 h4 h5 h6 p table figure pre blockquote ul ol".split()
)

VOID_TAGS = frozenset(
    "br hr img input meta link base col wbr source track param".split()
)

# Max link-text density for a text block to survive boilerplate stripping.
MAX_LINK_DENSITY = 0.5
# Minimum visible characters for a text block to be emitted.
MIN_TEXT_CHARS = 3
# Hard cap on html size; larger inputs are truncated and flagged (SURVEY §7.4.5).
MAX_HTML_BYTES = 2_000_000

# Engine version stamped on every document (IRDocument.parser_version analog,
# /root/reference/src/models/block.py:163).
PARSER_VERSION = "rps-0.2.0"

# Figure→chart reclassification cue words (M5 slot: the reference sends chart
# regions to a model, src/chart/extractor.py:29-96 [mock]; the engine's rule
# is a deterministic keyword test on alt/src/figcaption).
CHART_CUES = ("chart", "plot", "graph")

# Anchor abbreviations, reference /root/reference/src/models/block.py:62-70.
TYPE_ABBREV = {
    "text": "txt",
    "title": "ttl",
    "section_header": "sec",
    "table": "tbl",
    "figure": "fig",
    "chart": "cht",
    "formula": "eq",
    "picture": "fig",
}

_WS_RE = re.compile(r"\s+")
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)")
_FORMULA_RE = re.compile(r"^\$\$.*\$\$$", re.S)

_CHARSET_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "euc-kr": "euc-kr",
    "euckr": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "shift_jis": "shift_jis",
    "big5": "big5",
}


def norm_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def anchor_for(page: int, btype: str, order: int) -> str:
    """[@p{page}_{abbrev}{order}] per /root/reference/src/models/block.py:62-70."""
    abbrev = TYPE_ABBREV.get(btype.lower(), btype[:3])
    return f"[@p{page}_{abbrev}{order}]"


def content_hash(text: str) -> str:
    """sha256[:12], reference /root/reference/src/models/chunk.py:86-88."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()[:12]


def doc_id_for(html: bytes) -> str:
    """sha256[:16] of source bytes, /root/reference/src/models/block.py:226-230."""
    return hashlib.sha256(html).hexdigest()[:16]


# --- charset decode ----------------------------------------------------------

def decode_html(raw: Optional[bytes]) -> tuple[str, str, Optional[str]]:
    """Deterministically decode page bytes.

    Policy (fixed, recorded per row — SURVEY.md §7.4.4): sniff ``charset=``
    in the first 2048 bytes; normalize through a fixed alias table; unknown
    or missing declarations fall back to utf-8; always ``errors='replace'``.

    Returns (text, charset_used, failure_code_or_None).
    """
    if raw is None or len(raw) == 0:
        return "", "utf-8", "EMPTY_HTML"
    failure = None
    if len(raw) > MAX_HTML_BYTES:
        raw = raw[:MAX_HTML_BYTES]
        failure = "OVERSIZE_TRUNCATED"
    m = _CHARSET_RE.search(raw[:2048])
    charset = "utf-8"
    if m:
        declared = m.group(1).decode("ascii", "replace").lower()
        charset = _CHARSET_ALIASES.get(declared, "utf-8")
    try:
        text = raw.decode(charset, errors="replace")
    except LookupError:  # codec missing in this runtime
        charset = "utf-8"
        text = raw.decode(charset, errors="replace")
    return text, charset, failure


# --- DOM ---------------------------------------------------------------------

@dataclass(slots=True)
class _Node:
    tag: str
    attrs: dict
    children: list = field(default_factory=list)  # _Node | str
    _text: Optional[str] = None  # memo — nodes are immutable after parse

    def own_text_parts(self) -> list[str]:
        out: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in DROP_TAGS:
                out.extend(c.own_text_parts())
        return out

    def text(self) -> str:
        t = self._text
        if t is None:
            t = self._text = norm_ws("".join(self.own_text_parts()))
        return t

    def link_chars(self) -> int:
        n = 0
        for c in self.children:
            if isinstance(c, str):
                continue
            if c.tag == "a":
                n += len(c.text())
            elif c.tag not in DROP_TAGS:
                n += c.link_chars()
        return n

    def find_all(self, tag: str) -> list["_Node"]:
        out = []
        for c in self.children:
            if isinstance(c, str):
                continue
            if c.tag == tag:
                out.append(c)
            out.extend(c.find_all(tag))
        return out

    def first(self, tag: str) -> Optional["_Node"]:
        for c in self.children:
            if isinstance(c, str):
                continue
            if c.tag == tag:
                return c
            got = c.first(tag)
            if got is not None:
                return got
        return None


class _TreeBuilder(HTMLParser):
    """Forgiving tree builder over stdlib HTMLParser (convert_charrefs=True,
    so entities arrive decoded)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("document", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (forgiving recovery)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


class _FastBailout(Exception):
    """Raised by _fast_tree on any construct outside its exactly-mirrored
    subset; parse_tree falls back to the stdlib builder."""


_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.I)
    for t in ("script", "style")
}
_COMMENT_CLOSE = re.compile(r"--\s*>")

# Fast common-case start tag: simple name, space-separated double-quoted
# attrs with no entities/brackets, optional '/>'. A strict SUBSET of what
# the stdlib grammar accepts with UNAMBIGUOUS identical semantics — one
# regex replaces the locatestarttagend/tagfind/attrfind triple-pass for
# ~95% of real-world tags; anything it doesn't match falls through to the
# exact stdlib-mirror path below (NOT a bailout).
_SIMPLE_TAG = re.compile(
    r'([a-zA-Z][a-zA-Z0-9]*)'
    r'((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*="[^"&<>]*")*)'
    r'\s*(/?)>')
_SIMPLE_ATTR = re.compile(r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)="([^"]*)"')


def _fast_tree(s: str) -> _Node:
    """Single-pass tokenizer over the whole string — the hot path.

    Produces the SAME tree as _TreeBuilder (stdlib HTMLParser,
    convert_charrefs=True) for the constructs it accepts, reusing the
    stdlib's own tolerant regexes for tag/attr grammar so the accepted
    subset is semantically identical; anything else (bogus end tags,
    unterminated comments/tags, '</>' …) raises _FastBailout and the caller
    re-parses with the stdlib builder. Equality over the datagen corpus,
    the malformed-HTML fixtures, and a structured fuzz sweep is asserted in
    tests/test_kernel.py. ~3× faster than HTMLParser.goahead because it
    skips the incremental-feed buffering, line/col tracking, and per-token
    method dispatch."""
    root = _Node("document", {})
    stack = [root]
    i, n = 0, len(s)
    sfind = s.find
    simple_match = _SIMPLE_TAG.match
    simple_attrs = _SIMPLE_ATTR.findall
    loc_match = locatestarttagend_tolerant.match
    tag_match = tagfind_tolerant.match
    attr_match = attrfind_tolerant.match
    end_match = endtagfind.match
    while i < n:
        lt = sfind("<", i)
        if lt < 0:
            if i < n:
                data = s[i:]
                stack[-1].children.append(
                    unescape(data) if "&" in data else data)
            break
        if lt > i:
            data = s[i:lt]
            stack[-1].children.append(unescape(data) if "&" in data else data)
        c = s[lt + 1:lt + 2]
        # ASCII letters only — stdlib starttagopen is `<[a-zA-Z]`; a '<'
        # before a non-ASCII letter ('<é', '<中') is DATA, and str.isalpha()
        # would wrongly enter the tag branch (then crash on a None match)
        if "a" <= c <= "z" or "A" <= c <= "Z":
            sm = simple_match(s, lt + 1)
            if sm is not None:
                tag = sm.group(1).lower()
                a_str = sm.group(2)
                attrs: dict = (
                    {k.lower(): v for k, v in simple_attrs(a_str)}
                    if a_str else {}
                )
                selfclose = sm.group(3) == "/"
                i = sm.end()
            else:
                m = loc_match(s, lt)
                if m is None:
                    raise _FastBailout
                j = m.end()
                if s.startswith(">", j):
                    endpos = j + 1
                elif s.startswith("/>", j):
                    endpos = j + 2
                else:
                    raise _FastBailout  # incomplete/odd start tag → stdlib
                tagm = tag_match(s, lt + 1)
                tag = tagm.group(1).lower()
                attrs = {}
                k = tagm.end()
                while k < endpos:
                    am = attr_match(s, k)
                    if not am:
                        break
                    name, rest, val = am.group(1, 2, 3)
                    if not rest:
                        val = None
                    else:
                        if val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
                            val = val[1:-1]
                        if "&" in val:
                            val = unescape(val)
                    attrs[name.lower()] = val
                    k = am.end()
                tail = s[k:endpos].strip()
                if tail not in (">", "/>"):
                    # stdlib parse_starttag: junk between attrs and '>' →
                    # the whole tag text is data (raw, no unescape)
                    stack[-1].children.append(s[lt:endpos])
                    i = endpos
                    continue
                selfclose = tail == "/>"
                i = endpos
            node = _Node(tag, attrs)
            stack[-1].children.append(node)
            if not selfclose and tag not in VOID_TAGS:
                stack.append(node)
                cd = _CDATA_CLOSE.get(tag)
                if cd is not None:
                    mm = cd.search(s, i)
                    if mm is None:
                        raise _FastBailout  # unterminated cdata element
                    if mm.start() > i:
                        node.children.append(s[i:mm.start()])  # raw, no unescape
                    del stack[-1]
                    i = mm.end()
        elif c == "/":
            m = end_match(s, lt)
            if m is None:
                raise _FastBailout  # bogus end tag → stdlib recovery
            tag = m.group(1).lower()
            for j in range(len(stack) - 1, 0, -1):
                if stack[j].tag == tag:
                    del stack[j:]
                    break
            i = m.end()
        elif c == "!":
            if s.startswith("<!--", lt):
                # stdlib commentclose is r'--\s*>' (NOT the literal '-->')
                mm = _COMMENT_CLOSE.search(s, lt + 4)
                if mm is None:
                    raise _FastBailout
                i = mm.end()
            elif s.startswith("<![", lt):
                # stdlib marked-section handling is keyword-dependent
                # (']>' for cdata/ignore/…, '>' for if/else, AssertionError
                # for unknown keywords) — always defer to the stdlib path
                raise _FastBailout
            else:
                end = sfind(">", lt)
                if end < 0:
                    raise _FastBailout
                i = end + 1
        elif c == "?":
            end = sfind(">", lt)
            if end < 0:
                raise _FastBailout
            i = end + 1
        else:
            stack[-1].children.append("<")
            i = lt + 1
    return root


def parse_tree(html_text: str) -> _Node:
    try:
        return _fast_tree(html_text)
    except _FastBailout:
        b = _TreeBuilder()
        b.feed(html_text)
        b.close()
        return b.root


def parse_tree_stdlib(html_text: str) -> _Node:
    """The stdlib-HTMLParser reference path (equality twin for the fast
    tokenizer; also the _FastBailout fallback)."""
    b = _TreeBuilder()
    b.feed(html_text)
    b.close()
    return b.root


# --- table / figure rendering ------------------------------------------------

def _table_rows(table: _Node) -> list[list[str]]:
    """Collect cell texts row-wise, honoring colspan padding
    (semantics of /root/reference/src/output/writer.py:337-395)."""
    rows: list[list[str]] = []
    for tr in table.find_all("tr"):
        cells: list[str] = []
        for c in tr.children:
            if isinstance(c, str) or c.tag not in ("td", "th"):
                continue
            txt = c.text()
            cells.append(txt)
            try:
                span = int(c.attrs.get("colspan", "1"))
            except ValueError:
                span = 1
            cells.extend("" for _ in range(max(0, span - 1)))
        if cells:
            rows.append(cells)
    return rows


def table_markdown(table: _Node, rows: list[list[str]] | None = None) -> str:
    """Markdown table: header row + --- separator, rows padded to header
    width (reference writer.py:337-395 behavior). `rows` lets the caller
    pass precomputed _table_rows (the block path needs them three ways —
    text, markdown, dims — and the row walk is ~10% of kernel time)."""
    if rows is None:
        rows = _table_rows(table)
    if not rows:
        return ""
    width = len(rows[0])
    header = rows[0] + [""] * 0
    lines = ["| " + " | ".join(header) + " |",
             "| " + " | ".join(["---"] * width) + " |"]
    for r in rows[1:]:
        r = (r + [""] * width)[:width]
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def table_text(table: _Node, rows: list[list[str]] | None = None) -> str:
    """Plain-text table: cells joined ' | ', one line per row
    (/root/reference/src/layout/qwen_parser.py:525-533 semantics)."""
    if rows is None:
        rows = _table_rows(table)
    return "\n".join(" | ".join(r) for r in rows)


# --- block extraction ----------------------------------------------------------

def _render_markdown(btype: str, text: str, extra: dict) -> str:
    """Type-dispatched markdown, reference ir_processor.py:341-384 semantics:
    title→'# ', section_header→'## ', caption italic, figure/chart tagged."""
    if btype == "title":
        return f"# {text}"
    if btype == "section_header":
        return f"## {text}"
    if btype == "caption":
        return f"*{text}*"
    if btype == "table":
        return extra.get("table_md", text)
    if btype in ("figure", "chart"):
        src = extra.get("src", "")
        cap = extra.get("caption", "")
        tag = "chart" if btype == "chart" else "figure"
        md = f"![{tag}]({src})" if src else ("[Chart]" if btype == "chart"
                                             else "[Figure]")
        if cap:
            md += f"\n\n*{cap}*"
        return md
    if btype == "formula":
        return text
    return text


def _emit_blocks(body: _Node, page_of: dict[int, int]) -> list[dict]:
    """Walk the DOM in document order emitting typed candidate blocks.

    Boilerplate rules (Readability/trafilatura-style, fixed constants):
    - DROP_TAGS / CHROME_TAGS subtrees are skipped entirely;
    - a text-ish block survives only if link_density <= MAX_LINK_DENSITY;
    - empty / sub-minimum text is skipped.
    """
    blocks: list[dict] = []
    seen_h1 = False

    def visit(node: _Node, page: int) -> None:
        nonlocal seen_h1
        for c in node.children:
            if isinstance(c, str):
                continue
            if c.tag in DROP_TAGS or c.tag in CHROME_TAGS:
                continue
            # page wrapper: <div class="page"> increments the page counter
            if c.tag == "div" and "page" in (c.attrs.get("class") or "").split():
                page_of["n"] = page_of.get("n", 0) + 1
                visit(c, page_of["n"])
                continue
            if c.tag in BLOCK_TAGS:
                blk = _block_from(c, page)
                if blk is not None:
                    if blk["type"] == "title":
                        if seen_h1:
                            blk["type"] = "section_header"
                        seen_h1 = True
                    blocks.append(blk)
                continue  # block tags are terminal: no nested block emission
            visit(c, page)

    visit(body, 1 if not page_of.get("n") else page_of["n"])
    return blocks


def _block_from(node: _Node, page: int) -> Optional[dict]:
    tag = node.tag
    extra: dict = {}
    if tag == "h1":
        btype = "title"
        text = node.text()
    elif tag in ("h2", "h3", "h4", "h5", "h6"):
        btype = "section_header"
        text = node.text()
    elif tag == "table":
        btype = "table"
        rows = _table_rows(node)
        text = table_text(node, rows)
        extra["table_md"] = table_markdown(node, rows)
        extra["dims"] = (len(rows), len(rows[0]) if rows else 0)
    elif tag == "figure":
        img = node.first("img")
        cap = node.first("figcaption")
        extra["src"] = (img.attrs.get("src", "") if img is not None else "")
        extra["caption"] = cap.text() if cap is not None else ""
        alt = img.attrs.get("alt", "") if img is not None else ""
        extra["alt"] = norm_ws(alt)
        cues = f"{extra['src']} {extra['alt']} {extra['caption']}".lower()
        btype = "chart" if any(c in cues for c in CHART_CUES) else "figure"
        text = extra["caption"] or extra["alt"]
    elif tag == "pre":
        raw = node.text()
        btype = "formula" if _FORMULA_RE.match(raw) else "text"
        text = raw
    elif tag in ("ul", "ol"):
        btype = "text"
        items = [li.text() for li in node.find_all("li")]
        items = [i for i in items if i]
        text = "\n".join(f"- {i}" for i in items)
        # boilerplate: menu lists are link-dominated
        total = sum(len(i) for i in items)
        if total == 0:
            return None
        if node.link_chars() / max(1, len(node.text())) > MAX_LINK_DENSITY:
            return None
    else:  # p, blockquote
        btype = "text"
        text = node.text()
        if len(text) >= MIN_TEXT_CHARS:
            if node.link_chars() / max(1, len(node.text())) > MAX_LINK_DENSITY:
                return None
    if not text or len(text) < MIN_TEXT_CHARS:
        return None
    return {"type": btype, "text": text, "page": page, "extra": extra}


# --- captions / lines / doc metadata -------------------------------------------

_CAPTION_LABEL = {"figure": "Figure", "chart": "Chart", "table": "Table",
                  "formula": "Formula"}


def caption_for(btype: str, index: int, extra: dict, text: str,
                section: Optional[str]) -> Optional[str]:
    """M3/M5 deterministic caption: per-type template from context —
    '{Label} {k}: {descriptor} — {nearest heading}'. Replaces the reference's
    per-type VLM prompts (/root/reference/src/captioning/vlm.py:20-76) with
    the same interface (structured, per-type, context-aware) per the north
    rule. Text-ish types carry no caption (vlm.py captions visual types only).
    """
    label = _CAPTION_LABEL.get(btype)
    if label is None:
        return None
    if btype in ("figure", "chart"):
        desc = extra.get("caption") or extra.get("alt") or f"[{label}]"
    elif btype == "table":
        nrows, ncols = extra.get("dims", (0, 0))
        desc = f"{nrows}x{ncols}"
    else:  # formula
        desc = text[:40]
    cap = f"{label} {index}: {desc}"
    if section:
        cap += f" — {section}"
    return cap


def line_spans(text: str, span_start: int) -> list[dict]:
    """ocr_lines analog (block.py:57): non-empty '\\n'-split segments of the
    block text as ABSOLUTE (start, end) offsets into the document text."""
    out: list[dict] = []
    local = 0
    for seg in text.split("\n"):
        if seg:
            out.append({"start": span_start + local,
                        "end": span_start + local + len(seg)})
        local += len(seg) + 1
    return out


def meta_authors(tree: _Node) -> list[str]:
    """<meta name="author" content="..."> values in document order
    (IRDocument.authors analog, block.py:158)."""
    out = []
    for m in tree.find_all("meta"):
        if (m.attrs.get("name") or "").lower() == "author":
            c = norm_ws(m.attrs.get("content") or "")
            if c:
                out.append(c)
    return out


# --- document assembly ---------------------------------------------------------

def assemble_text(blocks: list[dict]) -> str:
    """Join block texts in reading order with '\\n\\n' (the reference's chunk
    merge separator, /root/reference/src/processing/chunking.py:154), applying
    the deterministic page-boundary merge rule (kernel.pagemerge) between
    consecutive blocks that straddle a page break."""
    out = ""
    prev_page: Optional[int] = None
    for b in blocks:
        t = b["text"]
        if not t:
            continue
        if not out:
            out = t
        else:
            kind = None
            if prev_page is not None and b["page"] == prev_page + 1:
                kind = merge_kind(out[-8:], t[:8])
            if kind == "hyphen":
                out = out[:-1] + t
            elif kind == "space":
                out = out + " " + t
            else:
                out = out + "\n\n" + t
        prev_page = b["page"]
    return out


def extract_document(raw: Optional[bytes]) -> dict:
    """Full per-document extraction: bytes → typed blocks + assembled text.

    Returns a plain dict (Arrow/JSON-friendly):
      doc_id, charset, failure_code, title, n_pages, extracted_text,
      blocks: list[dict(page, block_id, type, reading_order, text, markdown,
                        lang, span_start, span_end, anchor, content_hash)]
    """
    raw = bytes(raw) if raw is not None else b""
    doc_id = doc_id_for(raw)
    text, charset, failure = decode_html(raw)
    blocks_raw: list[dict] = []
    authors: list[str] = []
    if failure != "EMPTY_HTML" and text:
        try:
            tree = parse_tree(text)
            authors = meta_authors(tree)
            body = tree.first("body") or tree
            page_counter: dict[int, int] = {}
            blocks_raw = _emit_blocks(body, page_counter)
        except Exception:  # noqa: BLE001 — any parse blowup becomes a failure code
            failure = failure or "PARSE_ERROR"
            blocks_raw = []
    if not blocks_raw and failure is None:
        failure = "NO_CONTENT"

    # reading order + per-page block ids (block_id 'p{page}_b{order}' per
    # /root/reference/src/models/block.py:28); section carry-forward for
    # captions (W5 semantics, ir_processor.py:258-260)
    per_page_counter: dict[int, int] = {}
    per_type_counter: dict[str, int] = {}
    section: Optional[str] = None
    blocks: list[dict] = []
    extracted = assemble_text(blocks_raw)
    cursor = 0
    for order, b in enumerate(blocks_raw):
        page = b["page"]
        per_page_counter[page] = per_page_counter.get(page, 0)
        bid = f"p{page}_b{per_page_counter[page]}"
        per_page_counter[page] += 1
        btext = b["text"]
        btype = b["type"]
        # span offsets into the assembled extracted_text; merges can alter
        # the hyphenated tail, so search from cursor for robustness.
        start = extracted.find(btext, max(0, cursor - 2))
        if start < 0:
            start = extracted.find(btext[: max(1, len(btext) // 2)], max(0, cursor - 2))
        if start < 0:
            start = cursor
        end = min(len(extracted), start + len(btext))
        cursor = end
        per_type_counter[btype] = per_type_counter.get(btype, 0) + 1
        blocks.append(
            {
                "page": page,
                "block_id": bid,
                "type": btype,
                "reading_order": order,
                "text": btext,
                "markdown": _render_markdown(btype, btext, b["extra"]),
                "caption": caption_for(btype, per_type_counter[btype],
                                       b["extra"], btext, section),
                "lang": detect_language(btext),
                "span_start": start,
                "span_end": end,
                "anchor": anchor_for(page, btype, order),
                "content_hash": content_hash(btext),
                "lines": line_spans(btext, start),
            }
        )
        if btype in ("title", "section_header"):
            section = btext

    title = next((b["text"] for b in blocks if b["type"] == "title"), None)
    n_pages = max((b["page"] for b in blocks), default=1)
    return {
        "doc_id": doc_id,
        "charset": charset,
        "failure_code": failure,
        "title": title,
        "authors": authors,
        "parser_version": PARSER_VERSION,
        "n_pages": n_pages,
        "extracted_text": extracted,
        "blocks": blocks,
    }
