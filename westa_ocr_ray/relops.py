"""Reusable relational operator patterns, Ray-Data-first.

These are the engine's general-purpose building blocks (SURVEY.md §2.4,
§2.5): partial aggregation before the shuffle, broadcast joins for small
sides, and an explicit partitioned hash join for large-large joins.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# ------------------------------------------------------------------ agg

_FINAL_AGG = {"sum": Sum, "count": Sum, "min": Min, "max": Max}


def partial_aggregate(ds: rd.Dataset, keys: Sequence[str],
                      aggs: Dict[str, Tuple[str, str]]) -> rd.Dataset:
    """groupby with a per-batch combiner (SURVEY.md §2.5 G4): aggregate
    inside map_batches first — one row per key per batch — then shuffle
    only the partials. ``aggs``: out_col -> (op, in_col) with op in
    sum/count/min/max. count(in_col=None) counts rows.

    This is the scale-critical shape: the all-to-all exchange moves
    |keys| × |blocks| rows instead of every input row.
    """
    keys = list(keys)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        named = {}
        for out, (op, col) in aggs.items():
            if op == "count":
                named[out] = (col or keys[0], "size" if col is None else "count")
            else:
                named[out] = (col, op)
        g = df.groupby(keys, sort=False, as_index=False).agg(**named)
        return g

    partials = ds.map_batches(combine, batch_format="pandas")
    final_aggs = [
        _FINAL_AGG[op if op != "count" else "sum"](out, alias_name=out)
        for out, (op, _col) in aggs.items()
    ]
    return partials.groupby(keys).aggregate(*final_aggs)


# ---------------------------------------------------------------- joins


def broadcast_join(ds: rd.Dataset, small: pd.DataFrame, on: Sequence[str] | str,
                   how: str = "inner") -> rd.Dataset:
    """Join against a small side without a shuffle (J1): the small table
    is put in the object store ONCE and each task/actor reads it from
    there — never re-shipped per batch."""
    ref = ray.put(small)

    class Joiner:
        def __init__(self) -> None:
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def hash_join(left: rd.Dataset, right: rd.Dataset, left_on: str, right_on: str,
              num_buckets: int = 32, how: str = "inner",
              suffix: str = "_r") -> rd.Dataset:
    """Partitioned hash join for two large sides: bucket both inputs by
    hash(key) % B, co-locate buckets with a single groupby shuffle, and
    merge bucket-locally. Skewed keys can be salted by raising
    num_buckets. (ray_guide.md 'both sides large' pattern.)"""

    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    # rename right side: key → left key name, collisions → suffix
    r_rename = {right_on: left_on}
    for c in r_cols:
        if c != right_on and c in l_cols:
            r_rename[c] = c + suffix
    r_out = [r_rename.get(c, c) for c in r_cols]
    all_cols = l_cols + [c for c in r_out if c not in l_cols]

    def tag(side: int, key: str, rename: Optional[Dict[str, str]]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if rename:
                df = df.rename(columns=rename)
            df["__bucket"] = (df[key].astype("int64") % num_buckets).astype("int32")
            df["__side"] = np.int8(side)
            for c in all_cols:
                if c not in df.columns:
                    df[c] = None
            return df[all_cols + ["__bucket", "__side"]]
        return fn

    l_tagged = left.map_batches(tag(0, left_on, None), batch_format="pandas")
    r_tagged = right.map_batches(tag(1, left_on, r_rename), batch_format="pandas")
    both = l_tagged.union(r_tagged)

    keep_l = l_cols
    keep_r = [c for c in r_out if c == left_on or c not in l_cols]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df.loc[df["__side"] == 0, keep_l]
        rhs = df.loc[df["__side"] == 1, keep_r]
        return lhs.merge(rhs, on=left_on, how=how)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def semi_anti_filter(ds: rd.Dataset, key: str, key_set, anti: bool = False) -> rd.Dataset:
    """Semi/anti join via a broadcast key set (M9 resume anti-join)."""
    ref = ray.put(frozenset(key_set))

    def fn(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = np.fromiter((k in keys for k in t.column(key).to_pylist()),
                           dtype=bool, count=t.num_rows)
        return t.filter(pa.array(~mask if anti else mask))

    return ds.map_batches(fn, batch_format="pyarrow")
