"""Reassembly stage: per-partition merge-by-offset + per-doc summary.

This is the one shuffle the pipeline needs (north rule: groupby-doc_id
shuffle before span reassembly). We group by the output partition
(`part` = crc32(doc_id) % P) rather than doc_id itself: every doc's
units land in exactly one group, groups are few and bounded, and the
group boundary doubles as the resumable-output / lineage boundary.

Within a partition (vectorized: one sort + numpy boundary math — no
per-row python):
- stable sort by (doc_id, offset, span_idx, page_idx) — the ordered
  reassembly contract (reference repository.py:384-394 ORDER BY
  page_index; FIXTURES.md merge rule),
- first-wins dedup on (doc_id, span_idx, page_idx) — duplicate intake
  rows collapse (reference idempotency, app/main.py:157-188,
  repository.py:256-262 upsert),
- content units get order = 0..n-1 per doc; sentinel/empty units are
  skipped; error units recorded and "; "-joined (worker.py:479-494),
- per-doc counters — the JOB_SUMMARY aggregate (worker.py:697-747).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import RESULT_SCHEMA

_UNIT_COLS = ["doc_id", "part", "span_idx", "page_idx", "kind", "media_ref",
              "offset", "text", "is_content", "error", "master_hit"]


def reassemble_partition(t: pa.Table) -> pa.Table:
    """One output partition of extracted units → RESULT_SCHEMA rows."""
    if t.num_rows == 0:
        return RESULT_SCHEMA.empty_table()
    df = t.select(_UNIT_COLS).to_pandas()
    df.sort_values(["doc_id", "offset", "span_idx", "page_idx"],
                   inplace=True, kind="mergesort", ignore_index=True)
    df = df.drop_duplicates(subset=["doc_id", "span_idx", "page_idx"],
                            keep="first", ignore_index=True)

    err = (df["error"].to_numpy() != "")
    real_unit = df["span_idx"].to_numpy() >= 0
    content = (~err) & df["is_content"].to_numpy() & (df["text"].to_numpy() != "") & real_unit
    skipped = real_unit & (~err) & (~content)

    # --- per-doc counters (vectorized groupby-sum) -----------------------
    counters = pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "part": df["part"],
            "total_units": real_unit.astype(np.int32),
            "processed": content.astype(np.int32),
            "skipped": skipped.astype(np.int32),
            "errors": err.astype(np.int32),
            "master_hits": (content & df["master_hit"].to_numpy()).astype(np.int32),
        }
    )
    agg = counters.groupby("doc_id", sort=True).agg(
        part=("part", "first"), total_units=("total_units", "sum"),
        processed=("processed", "sum"), skipped=("skipped", "sum"),
        errors=("errors", "sum"), master_hits=("master_hits", "sum"),
    )
    if err.any():
        msgs = df.loc[err].groupby("doc_id", sort=True)["error"].agg("; ".join)
        agg["error_messages"] = msgs.reindex(agg.index, fill_value="")
    else:
        agg["error_messages"] = ""
    agg["status"] = np.where(agg["errors"].to_numpy() > 0, "ERROR", "DONE")

    # --- per-doc span lists (numpy boundary math, df already sorted) -----
    all_docs = agg.index.to_numpy()  # sorted unique
    ct = df.loc[content]
    ct_docs = ct["doc_id"].to_numpy()
    lo = np.searchsorted(ct_docs, all_docs, side="left")
    hi = np.searchsorted(ct_docs, all_docs, side="right")
    counts = (hi - lo).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    # order within doc = position - doc start
    starts = np.repeat(lo, counts)
    order_arr = (np.arange(len(ct), dtype=np.int64) - starts).astype(np.int32)

    structs = pa.StructArray.from_arrays(
        [
            pa.array(ct["kind"].to_numpy(), type=pa.string()),
            pa.array(ct["text"].to_numpy(), type=pa.string()),
            pa.array(ct["media_ref"].to_numpy(), type=pa.string()),
            pa.array(order_arr, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "order"],
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), structs)

    return pa.table(
        {
            "doc_id": pa.array(all_docs, type=pa.string()),
            "part": pa.array(agg["part"].to_numpy(), type=pa.int32()),
            "spans": spans,
            "total_units": pa.array(agg["total_units"].to_numpy(), type=pa.int32()),
            "processed": pa.array(agg["processed"].to_numpy(), type=pa.int32()),
            "skipped": pa.array(agg["skipped"].to_numpy(), type=pa.int32()),
            "errors": pa.array(agg["errors"].to_numpy(), type=pa.int32()),
            "error_messages": pa.array(agg["error_messages"].to_numpy(), type=pa.string()),
            "master_hits": pa.array(agg["master_hits"].to_numpy(), type=pa.int32()),
            "status": pa.array(agg["status"].to_numpy(), type=pa.string()),
        }
    )


def make_partition_writer(out_dir: str, attempt: int = 0) -> Callable[[pa.Table], pa.Table]:
    """Resumable sink: reassemble one partition, write it atomically
    (temp file + rename), then write the completion marker + lineage
    record (SURVEY.md §4.4 — the Arrow-world UPSERT-then-status-flip,
    reference repository.py:256-262 + worker.py:487-494).

    Returns a one-row marker table per partition (the pipeline's
    consumable output; the data itself is on disk)."""

    def write_partition(t: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        result = reassemble_partition(t)
        if result.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int32()),
                             "docs": pa.array([], type=pa.int64()),
                             "spans": pa.array([], type=pa.int64()),
                             "errors": pa.array([], type=pa.int64()),
                             "wall_ms": pa.array([], type=pa.int64())})
        part = int(result.column("part")[0].as_py())
        for d in ("extracted", "_markers", "lineage"):
            os.makedirs(os.path.join(out_dir, d), exist_ok=True)
        final = os.path.join(out_dir, "extracted", f"part-{part:05d}.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(result, tmp)
        os.replace(tmp, final)  # atomic on POSIX

        n_docs = result.num_rows
        n_spans = int(pa.compute.sum(result.column("processed")).as_py() or 0)
        n_err = int(pa.compute.sum(result.column("errors")).as_py() or 0)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        lineage = {
            "part": part, "attempt": attempt, "docs": n_docs, "spans": n_spans,
            "errors": n_err, "units_in": t.num_rows, "wall_ms": wall_ms,
            "model_version": "sim-ocr-v1",
        }
        with open(os.path.join(out_dir, "lineage", f"part-{part:05d}.jsonl"), "a") as fh:
            fh.write(json.dumps(lineage) + "\n")
        marker_tmp = os.path.join(out_dir, "_markers", f"part-{part:05d}.tmp.{os.getpid()}")
        with open(marker_tmp, "w") as fh:
            json.dump({"part": part, "rows": n_docs, "spans": n_spans,
                       "errors": n_err, "wall_ms": wall_ms, "attempt": attempt}, fh)
        os.replace(marker_tmp, os.path.join(out_dir, "_markers", f"part-{part:05d}.done"))

        return pa.table({"part": pa.array([part], type=pa.int32()),
                         "docs": pa.array([n_docs], type=pa.int64()),
                         "spans": pa.array([n_spans], type=pa.int64()),
                         "errors": pa.array([n_err], type=pa.int64()),
                         "wall_ms": pa.array([wall_ms], type=pa.int64())})

    return write_partition
