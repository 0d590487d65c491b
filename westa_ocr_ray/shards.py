"""Training-shard export: the terminal re-layout step of a training-data
pipeline — deterministic hash sharding of a cleaned corpus into S
equal-expectation shards, written as hive-partitioned Parquet (one
directory per shard) so a downstream trainer streams shard-parallel and
a failed export re-runs without clobbering finished output.

Shard assignment is content-independent and seedless: md5 of the
string-form doc id, so the same doc lands in the same shard on any
cluster shape / block layout, and DuckDB can recompute the assignment
bit-for-bit (queries.ORACLE_SQL['shard_stats'])."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import ray.data as rd

from .dedup import md5_hex
from .relops import partial_aggregate


def shard_assign(ds: rd.Dataset, num_shards: int = 64,
                 id_col: str = "doc_id") -> rd.Dataset:
    """Adds ``shard`` = first-8-hex-digits(md5(str(id))) % num_shards.
    Per-id md5 is a short-string hash per row (same accepted pattern as
    the stratified sampler); everything downstream is vectorized."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = np.fromiter(
            (int(md5_hex(str(i))[:8], 16) % num_shards for i in df[id_col]),
            dtype=np.int64, count=len(df))
        return df

    return ds.map_batches(fn, batch_format="pandas")


def shard_stats(ds: rd.Dataset, num_shards: int = 64,
                id_col: str = "doc_id",
                sum_cols: Sequence[str] = ("n_chars",),
                num_buckets: Optional[int] = None) -> rd.Dataset:
    """Per-shard (shard, n_docs, sum_<c>...) — the manifest a trainer
    uses to size its readers. One bucketed partial aggregate; only
    num_shards rows ever reach the driver."""
    aggs = {"n_docs": ("count", None)}
    for c in sum_cols:
        aggs["sum_" + c] = ("sum", c)
    return partial_aggregate(shard_assign(ds, num_shards, id_col)
                             .select_columns(["shard", *sum_cols]),
                             ["shard"], aggs, num_buckets=num_buckets)


def export_training_shards(ds: rd.Dataset, out_dir: str,
                           num_shards: int = 64,
                           id_col: str = "doc_id") -> str:
    """Writes ``out_dir/shard=<k>/*.parquet`` (hive partitioning via
    write_parquet(partition_cols), streaming — no per-shard
    materialization) and stamps ``_SUCCESS`` on completion. A re-run
    that finds the marker skips the export entirely (whole-export
    granularity: this is the terminal re-layout; mid-run resumability
    of the expensive upstream work is the extraction sink's marker
    system, stages/reassemble.py). Returns out_dir."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    shard_assign(ds, num_shards, id_col).write_parquet(
        out_dir, partition_cols=["shard"])
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir
