"""Map-side external-shuffle staging — pandas-free on purpose: this
module is imported inside extract-actor processes, and keeping the
import set to numpy+pyarrow keeps actor cold-start cheap."""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema([("part", pa.int32()), ("rows", pa.int64())])


def stage_write_table(t: pa.Table, stage_dir: str) -> pa.Table:
    """Write one stage file for this table: rows sorted by `part`, one
    row group per partition so reducers prune by parquet statistics.
    Returns the (part, rows) manifest."""
    if t.num_rows == 0:
        return MANIFEST_SCHEMA.empty_table()
    t = t.combine_chunks()
    parts = t.column("part").to_numpy()
    order = np.argsort(parts, kind="stable")
    t = t.take(pa.array(order, type=pa.int64()))
    sorted_parts = parts[order]
    uniq, starts = np.unique(sorted_parts, return_index=True)
    bounds = np.append(starts, len(sorted_parts))
    os.makedirs(stage_dir, exist_ok=True)
    fname = f"{os.getpid()}-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(stage_dir, "." + fname)
    # Stage files are transient intra-job data. Codec tradeoff, measured
    # (scripts/stage_codec_sweep.py, 597k docs @32cpu): none 32.6 s,
    # snappy 34.4 s, zstd 37.9 s — on RAM-backed scratch the encode CPU
    # outweighs the IO saved, while on real network/disk storage at
    # scale zstd wins. Auto: uncompressed on /dev/shm, snappy elsewhere;
    # WESTA_STAGE_CODEC overrides.
    codec = os.environ.get("WESTA_STAGE_CODEC")
    if codec is None:
        codec = "none" if stage_dir.startswith("/dev/shm") else "snappy"
    writer = pq.ParquetWriter(tmp, t.schema,
                              compression=None if codec == "none" else codec)
    for i in range(len(uniq)):
        writer.write_table(t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
    writer.close()
    os.replace(tmp, os.path.join(stage_dir, fname))
    return pa.table({"part": pa.array(uniq, type=pa.int32()),
                     "rows": pa.array((bounds[1:] - bounds[:-1]).astype(np.int64),
                                      type=pa.int64())})
