"""Single-process reference extraction — the spec the Ray pipeline is
judged against (SURVEY.md §5.2).

Recomputes, serially and per document, exactly what the pipeline
computes in parallel: explode → fetch/split → per-unit extraction →
ordered reassembly → summary counters. Composes the same pure functions
(extractors.py) the Ray stages use, so pipeline-vs-oracle equality tests
the *dataflow* (explode, shuffle, dedup, ordering), which is where
parallel bugs live.

Semantics anchored to the reference:
- unit order restored by sorting (repository.py:384-394 ORDER BY
  page_index; here (offset, span_idx, page_idx)),
- non-content sentinel pages skipped (GAS doc :356-359),
- errors recorded per unit, "; "-joined (worker.py:489),
- status DONE/ERROR (worker.py:487-494), zero-span docs DONE with zero
  counters (worker.py:236-254),
- duplicate doc_ids collapse first-wins (main.py:157-188).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from . import extractors, fixtures


def extract_doc(doc: Dict[str, object], seed: int = fixtures.DEFAULT_SEED,
                masters: Optional[Sequence[str]] = None) -> Dict[str, object]:
    """Expected output row for one document (RESULT_SCHEMA sans `part`)."""
    mkeys = list(masters) if masters is not None else fixtures.master_keys(seed)
    units = []  # (offset, span_idx, page_idx, kind, media_ref, text, is_content, error)
    for span_idx, span in enumerate(doc["spans"]):
        kind, offset = span["kind"], span["offset"]
        if kind in ("pdf", "image"):
            ref = span["media_ref"]
            try:
                blobs = extractors.split_payload(fixtures.media_store(ref, seed))
            except (extractors.MediaFormatError, OSError) as exc:
                units.append((offset, span_idx, 1, kind, ref, "", False,
                              f"media split failed: {exc}"))
                continue
            for page_idx, blob in enumerate(blobs, start=1):
                text, is_content, error = extractors.extract_unit(kind, "", blob)
                units.append((offset, span_idx, page_idx, kind, ref, text, is_content, error))
        else:
            text, is_content, error = extractors.extract_unit(kind, span["text"], None)
            units.append((offset, span_idx, 0, kind, "", text, is_content, error))

    units.sort(key=lambda u: (u[0], u[1], u[2]))
    spans_out, errors = [], []
    processed = skipped = master_hits = 0
    for offset, span_idx, page_idx, kind, ref, text, is_content, error in units:
        if error:
            errors.append(error)
        elif not is_content or text == "":
            skipped += 1
        else:
            spans_out.append({"kind": kind, "text": text, "media_ref": ref,
                              "order": len(spans_out)})
            processed += 1
            if any(k in text for k in mkeys):
                master_hits += 1
    return {
        "doc_id": doc["doc_id"],
        "spans": spans_out,
        "total_units": len(units),
        "processed": processed,
        "skipped": skipped,
        "errors": len(errors),
        "error_messages": "; ".join(errors),
        "master_hits": master_hits,
        "status": "ERROR" if errors else "DONE",
    }


#: in-process memo for default-masters extract_corpus calls — several
#: VALUES-oracle builders (extract_summary / media_usage /
#: mm_interleaved_pack) each replay the serial extraction at import
#: time on a cold disk cache; one pass serves all of them. Callers
#: treat the rows as read-only.
_CORPUS_MEMO: Dict[tuple, List[Dict[str, object]]] = {}


def extract_corpus(seed: int, n_docs: int,
                   masters: Optional[Sequence[str]] = None) -> List[Dict[str, object]]:
    """Expected rows for the fixture corpus, duplicate doc_ids collapsed
    first-wins, sorted by doc_id."""
    if masters is None and (seed, n_docs) in _CORPUS_MEMO:
        return _CORPUS_MEMO[(seed, n_docs)]
    mkeys = list(masters) if masters is not None else fixtures.master_keys(seed)
    seen = set()
    out = []
    for i in range(n_docs):
        doc = fixtures.gen_doc_row(seed, i)
        if doc["doc_id"] in seen:
            continue
        seen.add(doc["doc_id"])
        out.append(extract_doc(doc, seed, mkeys))
    out.sort(key=lambda r: r["doc_id"])
    if masters is None:
        _CORPUS_MEMO[(seed, n_docs)] = out
    return out
