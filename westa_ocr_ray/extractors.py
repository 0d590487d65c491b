"""Pure extraction functions — the semantic core, shared by the
single-process oracle (oracle.py) and the Ray stages (stages/).

Everything here is a pure, deterministic function of its inputs
(integer scoring, no wall clock, no float accumulation order issues) so
output is byte-identical across parallelism levels — the north rule's
span-sequence-equality invariant.

Reference anchors:
- HTML boilerplate strip: the north star mandates DOM-tree text-density
  heuristics (link-density / tag-depth scoring, Readability-style).
- Page parse + reading order: hermetic analog of the OCR/layout model
  (reference app/gemini.py:46-136; deterministic like its simulation
  branch gemini.py:62-75).
- Page split: reference app/pdf_utils.py:23-36 (1-based page index,
  per-page re-serialization).
"""

from __future__ import annotations

import struct as _struct
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .fixtures import MAGIC_IMG, MAGIC_PDF

# ------------------------------------------------------------- text ops


def normalize_ws(text: str) -> str:
    return " ".join(text.split())


# ------------------------------------------------------ html extraction

_BLOCK_TAGS = {
    "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "article", "section", "blockquote", "pre", "ul", "ol", "table", "body",
}

# integer scoring knobs (no float nondeterminism)
_LINK_PENALTY = 2          # score = text_len - 2*link_len - depth
_MIN_BLOCK_SCORE = 25      # blocks below this are boilerplate
_LINK_DENSITY_NUM = 1      # drop blocks with link_len * 3 >= text_len
_LINK_DENSITY_DEN = 3


class _BlockCollector(HTMLParser):
    """Collect text per nearest block-level ancestor, tracking DOM depth
    and whether text sits under an <a> (link text)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: List[str] = []
        self.link_depth = 0
        # blocks: list of [depth, parts:[(text, is_link)]]
        self.blocks: List[Tuple[int, List[Tuple[str, bool]]]] = []
        self._open_block_idx: List[int] = []  # parallel to block-tag positions in stack

    def handle_starttag(self, tag: str, attrs) -> None:
        self.stack.append(tag)
        if tag == "a":
            self.link_depth += 1
        if tag in _BLOCK_TAGS:
            self.blocks.append((len(self.stack), []))
            self._open_block_idx.append(len(self.blocks) - 1)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        # pop stack down to the matching open tag, closing blocks as we go
        if tag in self.stack:
            while self.stack:
                t = self.stack.pop()
                if t in _BLOCK_TAGS and self._open_block_idx:
                    self._open_block_idx.pop()
                if t == tag:
                    break

    def handle_data(self, data: str) -> None:
        if not data.strip():
            return
        if self._open_block_idx:
            depth, parts = self.blocks[self._open_block_idx[-1]]
            parts.append((data, self.link_depth > 0))


# Fast tokenizer path: well-formed tags with strictly-quoted attribute
# values (no '>' inside values), no entities/comments/doctypes/CDATA and
# no content-model-special elements. Anything else falls back to the
# stdlib HTMLParser. Both paths drive the SAME _BlockCollector state
# machine, so the block/score semantics cannot diverge — the fast path
# only replaces the tokenizer (HTMLParser's goahead/parse_starttag
# machinery is ~0.4 ms/doc, the single largest engine-side cost in the
# extract hot loop).
import re as _re2

_SIMPLE_TAG_RE = _re2.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:-]+(?:=(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s<>\"']+))?)*\s*)"
    r"(/?)>")
_FAST_UNSAFE_RE = _re2.compile(r"&|<[!?]|<\s*(?:script|style|textarea|title)\b",
                               _re2.I)


def _collect_blocks(html: str) -> _BlockCollector:
    p = _BlockCollector()
    if _FAST_UNSAFE_RE.search(html) is None:
        ok = True
        pos = 0
        for m in _SIMPLE_TAG_RE.finditer(html):
            if m.start() > pos:
                seg = html[pos:m.start()]
                if "<" in seg:      # stray '<' / malformed tag: bail out
                    ok = False
                    break
                p.handle_data(seg)
            closing, tag, attrs, selfclose = m.groups()
            if closing:
                if attrs.strip() or selfclose:  # junk end tag: bail out
                    ok = False
                    break
                p.handle_endtag(tag.lower())
            else:
                p.handle_starttag(tag.lower(), [])
                if selfclose:
                    p.handle_endtag(tag.lower())
            pos = m.end()
        if ok:
            tail = html[pos:]
            if "<" in tail:
                ok = False
            else:
                p.handle_data(tail)
        if ok:
            return p
        p = _BlockCollector()   # restart clean for the full parser
    p.feed(html)
    p.close()
    return p


def html_main_text(html: str) -> str:
    """DOM-tree text-density boilerplate strip.

    Per block (nearest block-level ancestor): text_len, link_text_len,
    depth. Keep blocks with integer score text_len - 2*link_len - depth
    >= 25 and link density < 1/3; join kept block texts in document
    order with newlines, whitespace-normalized per block.
    """
    try:
        p = _collect_blocks(html)
    except Exception:
        return normalize_ws(html)  # not parseable — degrade to raw text
    out: List[str] = []
    for depth, parts in p.blocks:
        if not parts:
            continue
        text = normalize_ws(" ".join(t for t, _ in parts))
        text_len = len(text)
        link_len = sum(len(normalize_ws(t)) for t, is_link in parts if is_link)
        if link_len * _LINK_DENSITY_DEN >= text_len * _LINK_DENSITY_NUM:
            continue  # link density >= 1/3 → boilerplate
        score = text_len - _LINK_PENALTY * link_len - depth
        if score < _MIN_BLOCK_SCORE:
            continue
        out.append(text)
    return "\n".join(out)


# ----------------------------------------------------- page-format parse

class MediaFormatError(ValueError):
    pass


def parse_pages(blob: bytes) -> List[Tuple[int, List[Tuple[int, int, str]]]]:
    """Parse the length-prefixed page format → [(flags, [(x, y, text)])].

    Raises MediaFormatError on bad magic / truncation (the fetch-failure
    analog, reference worker.py:205-216)."""
    if len(blob) < 6 or blob[:4] not in (MAGIC_PDF, MAGIC_IMG):
        raise MediaFormatError("bad magic")
    (n_pages,) = _struct.unpack_from("<H", blob, 4)
    pos = 6
    pages = []
    try:
        for _ in range(n_pages):
            flags, n_runs = _struct.unpack_from("<BH", blob, pos)
            pos += 3
            runs = []
            for _r in range(n_runs):
                x, y, blen = _struct.unpack_from("<HHH", blob, pos)
                pos += 6
                runs.append((x, y, blob[pos:pos + blen].decode("utf-8")))
                pos += blen
            pages.append((flags, runs))
    except (_struct.error, UnicodeDecodeError) as exc:
        raise MediaFormatError(f"truncated payload: {exc}") from exc
    if pos != len(blob):
        raise MediaFormatError("trailing bytes")
    return pages


def split_payload(blob: bytes) -> List[bytes]:
    """Split a multi-page payload into single-page payloads (1 blob per
    page, page order preserved) — the analog of split_pdf's per-page
    re-serialization (reference app/pdf_utils.py:23-36)."""
    magic = blob[:4]
    pages = parse_pages(blob)
    out = []
    for flags, runs in pages:
        parts = [magic, _struct.pack("<H", 1), _struct.pack("<BH", flags, len(runs))]
        for x, y, text in runs:
            b = text.encode("utf-8")
            parts.append(_struct.pack("<HHH", x, y, len(b)))
            parts.append(b)
        out.append(b"".join(parts))
    return out


def page_text(flags: int, runs: List[Tuple[int, int, str]]) -> Tuple[str, bool]:
    """(text, is_content) — reading-order reconstruction: sort runs by
    (y, x), join with spaces. Sentinel pages (flags bit 0) are
    non-content (analog of the reference's non-order-page marker, GAS doc
    :356-359)."""
    if flags & 1:
        return "", False
    ordered = sorted(runs, key=lambda r: (r[1], r[0]))
    return normalize_ws(" ".join(t for _x, _y, t in ordered)), True


def extract_unit(kind: str, text: str, payload: Optional[bytes]) -> Tuple[str, bool, str]:
    """Extract one unit → (text, is_content, error). Pure function.

    kinds: html/text use the inline text; pdf/image parse the (single
    page) payload. Errors are recorded, not raised (record-and-continue,
    reference worker.py:344-359)."""
    try:
        if kind == "html":
            return html_main_text(text), True, ""
        if kind == "text":
            return normalize_ws(text), True, ""
        if kind in ("pdf", "image"):
            pages = parse_pages(payload or b"")
            if len(pages) != 1:
                raise MediaFormatError(f"expected 1 page, got {len(pages)}")
            flags, runs = pages[0]
            t, is_content = page_text(flags, runs)
            return t, is_content, ""
        raise MediaFormatError(f"unknown kind: {kind}")
    except MediaFormatError as exc:
        return "", False, f"extract failed: {exc}"


# -------------------------------------- structured detail-row parse (M2)

# Mirrors the reference's parseMultiPageDataFromLLM
# (docs/google_apps_script_reference.md:346-407) with ASCII marker
# analogs: page-block split on the numbered delimiter (:349), non-order
# sentinel page (:355-359), lazy header regexes up to newline / next
# bracket / end (:362-364, helper :416-419 trims and defaults to ""),
# detail block = everything after the details marker (:366-372),
# comma rows trimmed per column with the <15-column drop (:373-396),
# and the keep-page rule header-or-rows (:401-403).

import re as _re

PAGE_DELIM_RE = _re.compile(r"--- PAGE \d+ ---")
NON_ORDER_SENTINEL = "THIS PAGE IS NOT AN ORDER."
_HDR_RES = {
    "h_customer": _re.compile(r"\[customer\](.*?)(?:\n|\[|$)"),
    "h_order_date": _re.compile(r"\[order_date\](.*?)(?:\n|\[|$)"),
    "h_order_no": _re.compile(r"\[order_no\](.*?)(?:\n|\[|$)"),
}
_DETAIL_RE = _re.compile(r"\[details\]([\s\S]*)")

DETAIL_FIELDS = [
    "slip_no", "delivery_loc", "customer_name", "cust_order_no",
    "order_date_f", "ship_date", "due_date", "cust_item_code",
    "item_code", "item_name", "qty", "unit", "unit_price",
    "delivery_note", "order_note",
]


def _extract_hdr(block: str, pat) -> str:
    m = pat.search(block)
    return m.group(1).strip() if m and m.group(1) else ""


def parse_detail_pages(text: str) -> List[dict]:
    """Structured parse of one document's multi-page LLM-response text.

    Returns a list of page dicts in block order (1-based ``page_idx``
    over the NON-blank blocks): sentinel pages as
    ``{"is_non_order": True}``, order pages as headers + a
    ``detail_rows`` list of 15-field dicts. Pages with neither a
    customer header nor detail rows are dropped (reference :401-403)."""
    blocks = [b for b in PAGE_DELIM_RE.split(text) if b.strip() != ""]
    pages: List[dict] = []
    for page_idx, block in enumerate(blocks, start=1):
        if NON_ORDER_SENTINEL in block:
            pages.append({"page_idx": page_idx, "is_non_order": True})
            continue
        hdrs = {k: _extract_hdr(block, p) for k, p in _HDR_RES.items()}
        detail_rows: List[dict] = []
        dm = _DETAIL_RE.search(block)
        if dm:
            for row in dm.group(1).strip().split("\n"):
                if row.strip() == "":
                    continue
                cols = [c.strip() for c in row.split(",")]
                if len(cols) >= 15:
                    detail_rows.append(dict(zip(DETAIL_FIELDS, cols[:15])))
                # <15 columns: row skipped (reference :394-396)
        if hdrs["h_customer"] or detail_rows:
            pages.append({"page_idx": page_idx, "is_non_order": False,
                          **hdrs, "detail_rows": detail_rows})
    return pages
