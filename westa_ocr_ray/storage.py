"""Physical-storage seam (SURVEY.md §7): the logical table is the Lance
table mandated by BASELINE.json.input_hint; this sandbox has no `lance`
module, so the physical format falls back to Parquet with the identical
logical schema. Swapping to Lance is contained to this file.
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd

try:  # pragma: no cover - lance absent in this environment
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: Optional[list] = None,
               num_blocks: Optional[int] = None) -> rd.Dataset:
    """Read a logical Lance table (Lance if importable, else Parquet)."""
    if HAVE_LANCE:
        ds = rd.read_lance(path, columns=columns)
        return ds
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    return rd.read_parquet(path, **kwargs)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE:
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def read_text_lines_as_documents(path: str, id_prefix: str = "line") -> rd.Dataset:
    """Ingest plain text (one document per line, `ray.data.read_text`)
    into the engine's interleaved documents schema — deterministic doc
    ids derive from the line content hash, so the ingest is stable
    across block splits and reruns."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    lines = rd.read_text(path)

    def to_docs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = t.num_rows
        ids = pa.array(
            [f"{id_prefix}_{hashlib.md5(s.encode()).hexdigest()[:16]}"
             for s in texts.to_pylist()], type=pa.string())
        structs = pa.StructArray.from_arrays(
            [pa.array(["text"] * n), texts, pa.array([""] * n),
             pa.array(np.zeros(n, dtype=np.int32))],
            names=["kind", "text", "media_ref", "offset"])
        spans = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32)), structs)
        return pa.table({"doc_id": ids, "spans": spans})

    return lines.map_batches(to_docs, batch_format="pyarrow")
