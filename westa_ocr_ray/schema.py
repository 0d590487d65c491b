"""Arrow schemas for the engine's logical tables.

The input shape is mandated by BASELINE.json.input_hint: a table of
interleaved text+media documents
(doc_id:string, spans:list<struct<kind,text,media_ref,offset:int32>>).

The reference's fixed Pydantic/SQLite schemas (app/models.py:55-67,
app/repository.py:47-97) become explicit pyarrow schemas; its
JSON-in-TEXT nesting becomes real Arrow struct/list types.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- input
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "html" | "text" | "pdf" | "image"
        ("text", pa.string()),       # inline content for html/text; "" for media
        ("media_ref", pa.string()),  # payload locator for pdf/image; "" for text-ish
        ("offset", pa.int32()),      # char offset in the interleaved doc, strictly increasing
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ------------------------------------------------------- exploded units
# One row per unit of work: a text-ish span is one unit; a media span is
# one unit per page (the reference's page fan-out, app/worker.py:284-286).
UNITS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part", pa.int32()),        # hash(doc_id) % num_parts — resume/output partition
        ("span_idx", pa.int32()),    # 0-based index in the source spans list; -1 = empty-doc sentinel
        ("page_idx", pa.int32()),    # 1-based page within a media span (pdf_utils.py:29); 0 for text-ish
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("payload", pa.binary()),    # single-page media blob; empty for text-ish units
        ("text", pa.string()),       # inline text for text-ish units
        ("size_class", pa.int8()),   # 0 light / 1 medium / 2 heavy — skew bucketing
        ("error", pa.string()),      # pre-extraction failure (fetch/split), "" = ok
    ]
)

# ------------------------------------------------------ extracted units
EXTRACTED_UNITS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part", pa.int32()),
        ("span_idx", pa.int32()),
        ("page_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("text", pa.string()),        # extracted text ("" for sentinel/error units)
        ("is_content", pa.bool_()),   # False for non-content sentinel pages (GAS doc :356-359)
        ("error", pa.string()),       # "" = ok; record-and-continue (worker.py:344-359)
        ("master_hit", pa.bool_()),   # broadcast-masters lookup hit (gemini.py:77-84 analog)
    ]
)

# ------------------------------------------------------------ output
EXTRACTED_SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),  # 0-based position in the final merged per-doc sequence
    ]
)

RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part", pa.int32()),
        ("spans", pa.list_(EXTRACTED_SPAN_STRUCT)),
        # per-doc summary counters (reference worker.py:453-505 / JOB_SUMMARY)
        ("total_units", pa.int32()),
        ("processed", pa.int32()),
        ("skipped", pa.int32()),
        ("errors", pa.int32()),
        ("error_messages", pa.string()),  # "; ".join(...) (worker.py:489)
        ("master_hits", pa.int32()),
        ("status", pa.string()),          # DONE | ERROR (models.py:12-18 subset)
    ]
)
