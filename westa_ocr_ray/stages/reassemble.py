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
import uuid
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


_EMPTY_MARKERS = {
    "part": pa.array([], type=pa.int32()),
    "docs": pa.array([], type=pa.int64()),
    "spans": pa.array([], type=pa.int64()),
    "errors": pa.array([], type=pa.int64()),
    "wall_ms": pa.array([], type=pa.int64()),
}


def _commit_partition(result: pa.Table, part: int, units_in: int, out_dir: str,
                      attempt: int, t0: float) -> dict:
    """Atomically write one output partition + its marker + lineage
    (SURVEY.md §4.4 — the Arrow-world UPSERT-then-status-flip,
    reference repository.py:256-262 + worker.py:487-494). The marker is
    renamed into place only after the data file is durable, so a `.done`
    check is always safe."""
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
        "errors": n_err, "units_in": units_in, "wall_ms": wall_ms,
        "model_version": "sim-ocr-v1",
    }
    with open(os.path.join(out_dir, "lineage", f"part-{part:05d}.jsonl"), "a") as fh:
        fh.write(json.dumps(lineage) + "\n")
    marker_tmp = os.path.join(out_dir, "_markers", f"part-{part:05d}.tmp.{os.getpid()}")
    marker = {"part": part, "rows": n_docs, "spans": n_spans,
              "errors": n_err, "wall_ms": wall_ms, "attempt": attempt}
    with open(marker_tmp, "w") as fh:
        json.dump(marker, fh)
    os.replace(marker_tmp, os.path.join(out_dir, "_markers", f"part-{part:05d}.done"))
    return marker


def _marker_table(markers: list) -> pa.Table:
    if not markers:
        return pa.table(_EMPTY_MARKERS)
    return pa.table({
        "part": pa.array([m["part"] for m in markers], type=pa.int32()),
        "docs": pa.array([m["rows"] for m in markers], type=pa.int64()),
        "spans": pa.array([m["spans"] for m in markers], type=pa.int64()),
        "errors": pa.array([m["errors"] for m in markers], type=pa.int64()),
        "wall_ms": pa.array([m["wall_ms"] for m in markers], type=pa.int64()),
    })


def make_partition_writer(out_dir: str, attempt: int = 0) -> Callable[[pa.Table], pa.Table]:
    """groupby-shuffle sink variant: reassemble one partition group and
    commit it. Returns a one-row marker table per partition."""

    def write_partition(t: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        result = reassemble_partition(t)
        if result.num_rows == 0:
            return pa.table(_EMPTY_MARKERS)
        part = int(result.column("part")[0].as_py())
        return _marker_table([_commit_partition(result, part, t.num_rows,
                                                out_dir, attempt, t0)])

    return write_partition


# ------------------------------------------- external (staged) shuffle
#
# Ray Data's sort-based groupby is an all-to-all barrier with a high
# constant factor in local mode (measured: slower at 32 CPUs than 8 on
# this corpus — see BASELINE.md). Since the partition id is already a
# column (`part`), the exchange can be a classic external shuffle
# instead: map tasks append per-partition parquet fragments
# (out/_stage/part-XXXXX/<uuid>.parquet), then one embarrassingly
# parallel reduce task per partition reads its fragments, reassembles,
# and commits. No barrier beyond the phase boundary (which the marker
# protocol needs anyway), and both phases stream/scale.


def make_stage_writer(stage_dir: str) -> Callable[[pa.Table], pa.Table]:
    def stage_write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int32()),
                             "rows": pa.array([], type=pa.int64())})
        t = t.combine_chunks()
        parts = t.column("part").to_numpy()
        order = np.argsort(parts, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        sorted_parts = parts[order]
        uniq, starts = np.unique(sorted_parts, return_index=True)
        bounds = np.append(starts, len(sorted_parts))
        fname = f"{os.getpid()}-{uuid.uuid4().hex[:12]}.parquet"
        for i, part in enumerate(uniq):
            sub = t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            pdir = os.path.join(stage_dir, f"part-{int(part):05d}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, "." + fname)
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(pdir, fname))
        return pa.table({"part": pa.array(uniq, type=pa.int32()),
                         "rows": pa.array((bounds[1:] - bounds[:-1]).astype(np.int64),
                                          type=pa.int64())})

    return stage_write


def make_part_reducer(stage_dir: str, out_dir: str,
                      attempt: int = 0) -> Callable[[pa.Table], pa.Table]:
    def reduce_parts(batch: pa.Table) -> pa.Table:
        markers = []
        for part in batch.column("part").to_pylist():
            t0 = time.perf_counter()
            pdir = os.path.join(stage_dir, f"part-{part:05d}")
            if os.path.isdir(pdir):
                frags = sorted(f for f in os.listdir(pdir)
                               if f.endswith(".parquet") and not f.startswith("."))
                t = pa.concat_tables([pq.read_table(os.path.join(pdir, f))
                                      for f in frags]) if frags else None
            else:
                t = None
            if t is None or t.num_rows == 0:
                result = RESULT_SCHEMA.empty_table()
                units_in = 0
            else:
                result = reassemble_partition(t)
                units_in = t.num_rows
            markers.append(_commit_partition(result, part, units_in,
                                             out_dir, attempt, t0))
        return _marker_table(markers)

    return reduce_parts
