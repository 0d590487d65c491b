"""Reusable relational operator patterns, Ray-Data-first.

These are the engine's general-purpose building blocks (SURVEY.md §2.4,
§2.5): partial aggregation before the shuffle, broadcast joins for small
sides, and an explicit partitioned hash join for large-large joins.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# --------------------------------------------------------------- sizing


#: target bytes of (shuffled) data per bucket: one bucket is processed by
#: ONE map_groups task, so this bounds per-task memory (SCALE.md
#: §partitioning states the same rule for the extraction partition count
#: P: ~1 GB of output per partition; buckets here see post-combine /
#: key-projected rows, so a smaller target keeps slack for pandas
#: overhead).
TARGET_BUCKET_BYTES = 256 << 20


#: serializes driver-side Dataset CONSTRUCTION across threads: ray's
#: path resolution probes `from fsspec.implementations.http import
#: HTTPFileSystem` on every read_parquet and only catches
#: ModuleNotFoundError — with aiohttp absent the import always fails,
#: and two threads importing the same failing module race Python's
#: partial-module state into a bare ImportError (observed in the
#: threaded combined_small_shapes). Shared here so every module that
#: constructs Datasets from driver threads takes the same lock.
import threading as _threading

DATASET_CONSTRUCTION_LOCK = _threading.Lock()


def auto_buckets(floor: int = 64, size_bytes: Optional[int] = None,
                 per_cpu: int = 4,
                 target_bytes: int = TARGET_BUCKET_BYTES) -> int:
    """Bucket-count sizing rule for the bucketed exchanges below
    (VERDICT r2 #1: fixed fan-in constants don't scale).

    Two scaling axes, take the max:
    - cluster axis: ``per_cpu`` buckets per cluster CPU, so the bucketed
      stage keeps every core busy and grows with cluster size;
    - data axis: ``size_bytes / target_bytes`` when the caller knows the
      input size (cheap for parquet inputs — file bytes; NOT derivable
      from a lazy transformed Dataset, whose ``size_bytes()`` executes
      the plan), so one bucket's rows always fit a worker task.

    ``floor`` preserves each call site's round-2 constant as the
    minimum, keeping small-input behavior (and every CORRECTNESS oracle,
    which is bucket-count independent) unchanged."""
    n = floor
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            n = max(n, per_cpu * cpus)
    except Exception:
        pass
    if size_bytes:
        n = max(n, -(-int(size_bytes) // target_bytes))
    return n


#: target bytes per BLOCK for checkpoint compaction (below); smaller
#: than a shuffle bucket because blocks are the streaming/scheduling
#: unit and want to outnumber cores.
TARGET_BLOCK_BYTES = 64 << 20


def compact_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Coalesce a MATERIALIZED dataset's fragmentation. Every bucketed
    exchange (groupby/map_groups, hash_join, union) emits one block per
    bucket regardless of size, so a chain of them on a modest input
    accumulates hundreds of tiny blocks — and downstream all-to-all
    costs scale with block COUNT, not bytes (a 5k-row chain measured
    63 s → 17 s at 32 cpus from this compaction alone).

    Block target = max(2 blocks per cluster CPU, bytes / 64 MiB): at
    real data sizes blocks are already big, the condition never fires,
    and the dataset streams through untouched — this only collapses
    pathological fragmentation, it never coarsens healthy layouts."""
    try:
        nblocks = ds.num_blocks()
        nbytes = ds.size_bytes() or 0
    except Exception:
        return ds
    cpus = 8
    try:
        if ray.is_initialized():
            cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    target = max(2 * cpus, -(-int(nbytes) // TARGET_BLOCK_BYTES))
    if nblocks > 2 * target:
        return ds.repartition(target).materialize()
    return ds


def input_size_bytes(*paths: str) -> int:
    """Total on-disk bytes of parquet files/dirs — the cheap data-size
    hint for auto_buckets (metadata only, no read)."""
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


# ------------------------------------------------------------------ agg


def partial_aggregate(ds: rd.Dataset, keys: Sequence[str],
                      aggs: Dict[str, Tuple[str, str]],
                      num_buckets: Optional[int] = None,
                      size_hint_bytes: Optional[int] = None) -> rd.Dataset:
    """groupby with a per-batch combiner (SURVEY.md §2.5 G4): aggregate
    inside map_batches first — one row per key per batch — then shuffle
    only the partials, hash-bucketed. ``aggs``: out_col -> (op, in_col)
    with op in sum/count/min/max. count(in_col=None) counts rows.

    Two scale decisions here:
    - the all-to-all moves |keys| × |blocks| partial rows, not every
      input row;
    - the exchange is keyed on hash(keys) % num_buckets and the final
      combine is a vectorized pandas groupby per bucket. (Ray's native
      groupby().aggregate() pays per-key overhead in the reduce — ~60x
      slower at 10^5+ distinct keys in ray 2.49; measured in BASELINE.md.)

    num_buckets defaults to the auto_buckets sizing rule (floor 64 = the
    round-2 constant); pass ``size_hint_bytes`` when the input size is
    known so the bucket count also scales with data.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(floor=64, size_bytes=size_hint_bytes)
    keys = list(keys)

    first_ops = {}
    for out, (op, col) in aggs.items():
        if op == "count":
            first_ops[out] = (keys[0], "size")
        else:
            first_ops[out] = (col, op)
    merge_ops = {out: (out, "sum" if op == "count" else op)
                 for out, (op, _c) in aggs.items()}

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False).agg(**first_ops)
        g["__bucket"] = (pd.util.hash_pandas_object(
            g[keys].apply(lambda c: c.astype(str)) if len(keys) > 1 else g[keys[0]].astype(str),
            index=False).to_numpy() % num_buckets).astype("int32")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop(columns="__bucket")
                  .groupby(keys, sort=False, as_index=False).agg(**merge_ops))

    # The bucketed groupby is a sort whose cost scales with the block
    # MATRIX (input blocks × buckets), not bytes: a fragmented partial
    # table (hundreds of tiny blocks after a long chain) pays seconds
    # of pure scheduling. The partials are sketch-sized by design
    # (|keys| × |blocks| rows), so materialize+compact is cheap here —
    # and compact_blocks' size guard leaves genuinely large partial
    # tables (high-cardinality keys at corpus scale) untouched.
    # Measured 5-7 s → 3.5-3.8 s on the snapshot-diff chain at 32 cpus
    # (same-window interleaved A/B, both reps); the groupby was already
    # a barrier, so streaming semantics are unchanged.
    partials = compact_blocks(
        ds.map_batches(combine, batch_format="pandas").materialize())
    return partials.groupby("__bucket").map_groups(merge, batch_format="pandas")


def grouped_topk(ds: rd.Dataset, group_cols: Sequence[str],
                 order_cols: Sequence[str], k: int,
                 ascending: "bool | Sequence[bool]" = False,
                 num_buckets: Optional[int] = None,
                 size_hint_bytes: Optional[int] = None) -> rd.Dataset:
    """Top-k rows per group WITHOUT a global sort (the per-group quota
    shape of training-data curation: "keep the N best docs per
    language"). Two bounded stages:

    1. every input block emits its own per-group top-k — a block
       contributes ≤ groups_in_block × k rows, so the shuffle moves
       candidates, never the corpus;
    2. candidates hash-bucket on the group key and each bucket takes the
       final per-group top-k (≤ blocks × k rows per group reach one
       task — bounded by the block count, not the group's size, which
       is what makes a skewed hot group safe).

    Adds ``rk`` (1-based rank within the group). ``order_cols`` should
    end in a unique column so ranks are deterministic under any block
    layout."""
    group_cols, order_cols = list(group_cols), list(order_cols)
    if num_buckets is None:
        num_buckets = auto_buckets(floor=64, size_bytes=size_hint_bytes)
    asc = ([ascending] * len(order_cols) if isinstance(ascending, bool)
           else list(ascending))
    sort_cols = group_cols + order_cols
    sort_asc = [True] * len(group_cols) + asc

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.copy()
            df["__b"] = pd.Series([], dtype="int32")
            return df
        top = (df.sort_values(sort_cols, ascending=sort_asc)
                 .groupby(group_cols, sort=False).head(k))
        top = top.copy()
        top["__b"] = (pd.util.hash_pandas_object(
            top[group_cols].apply(lambda c: c.astype(str))
            if len(group_cols) > 1 else top[group_cols[0]].astype(str),
            index=False).to_numpy() % num_buckets).astype("int32")
        return top

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns="__b")
                .sort_values(sort_cols, ascending=sort_asc,
                             ignore_index=True))
        df["rk"] = (df.groupby(group_cols, sort=False).cumcount() + 1
                    ).astype("int64")
        return df[df["rk"] <= k]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(final, batch_format="pandas"))


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
              num_buckets: Optional[int] = None, how: str = "inner",
              suffix: str = "_r",
              left_cols: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              hot_keys=None, salt: int = 8, auto_salt: bool = False,
              left_dedup_cols: Optional[Sequence[str]] = None,
              bucket_fn=None,
              size_hint_bytes: Optional[int] = None) -> rd.Dataset:
    """Partitioned hash join for two large sides: bucket both inputs by
    hash(key) % B, co-locate buckets with a single groupby shuffle, and
    merge bucket-locally. (SCALE.md §joins 'both sides large' pattern.)

    Skew: a hot key maps every one of its rows to ONE bucket no matter
    how large num_buckets is. Pass the known hot keys (from a cheap
    count pass or domain knowledge) as ``hot_keys``: left-side hot rows
    spread deterministically over ``salt`` consecutive buckets and
    right-side hot rows replicate into all of them, so the hot key's
    work fans out ``salt``-wide while every pair still meets exactly
    once. Inner/left joins only (a replicated right row would multiply
    unmatched-right output under full/right semantics).

    Pass ``left_cols``/``right_cols`` when the input is a lazy pipeline:
    ``Dataset.schema()`` EXECUTES the upstream plan to infer names (an
    all-to-all upstream can't early-stop at limit 1), so chained joins
    without the hints run their inputs once per probe.

    ``left_dedup_cols``: drop duplicate left rows on these columns
    INSIDE the join bucket — a free global dedup when the dedup key set
    includes the join key (all copies land in one bucket), saving the
    separate aggregate shuffle a pre-join dedup would cost. Not valid
    together with hot-key salting (salting splits a key's rows across
    buckets).

    ``bucket_fn``: optional post-merge transform applied to each joined
    bucket INSIDE the join task (fusion hook): map/partial-aggregate the
    joined rows before they ever leave the bucket, saving a full pass
    (and shuffle volume) over the join output. Receives and returns a
    pandas DataFrame.

    ``auto_salt=True``: a skewed join key at 100 TB won't announce
    itself, so instead of requiring the CALLER to know the hot keys,
    run sketches.detect_hot_keys as a pre-pass over the LEFT side's key
    column (one fused MG + count-min sketch scan; the driver folds ≤64
    summary rows) and salt whatever it finds. Opt-in because the
    pre-pass re-executes a lazy left input once (materialize the left
    first if its upstream is expensive). Ignored when ``hot_keys`` is
    given explicitly; requires inner/left semantics like manual
    salting.

    num_buckets defaults to the auto_buckets sizing rule (floor 32 =
    the round-2 constant); pass ``size_hint_bytes`` when the bigger
    side's size is known so the bucket count also scales with data."""
    if num_buckets is None:
        num_buckets = auto_buckets(floor=32, size_bytes=size_hint_bytes)
    if auto_salt and not hot_keys and not left_dedup_cols \
            and how in ("inner", "left"):
        from .sketches import detect_hot_keys
        hot_keys = detect_hot_keys(left.select_columns([left_on]),
                                   left_on, num_buckets)
    # salted right-side replicas land on `salt` CONSECUTIVE buckets; with
    # salt > num_buckets the replicas would wrap onto already-used
    # buckets and hot-key pairs would meet (and emit) more than once
    salt = min(salt, num_buckets)
    if hot_keys:
        assert how in ("inner", "left"), "salting supports inner/left joins"
        assert not left_dedup_cols, "left_dedup_cols requires single-bucket keys"
    if left_dedup_cols:
        assert left_on in left_dedup_cols, \
            "in-bucket dedup is only global when the join key is part of it"
    hot = frozenset(str(k) for k in (hot_keys or ()))
    dedup_cols = list(left_dedup_cols) if left_dedup_cols else None

    l_cols = list(left_cols) if left_cols is not None else list(left.schema().names)
    r_cols = list(right_cols) if right_cols is not None else list(right.schema().names)
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
            # hash the key's STRING form: works for any dtype (strings
            # included) and — crucially — gives identical buckets when
            # the same key arrives as int64 on one side and object on
            # the other (chained joins fill missing columns with None,
            # which upcasts carried key columns to object). Float keys
            # are not supported ("1" vs "1.0").
            key_str = df[key].astype(str)
            base = pd.util.hash_pandas_object(key_str, index=False).to_numpy()
            if hot:
                is_hot = key_str.isin(hot).to_numpy()
                if side == 0:
                    # spread each hot LEFT row over `salt` buckets,
                    # deterministically from its position within the batch
                    offs = np.where(is_hot,
                                    np.arange(len(df), dtype=np.uint64)
                                    % np.uint64(salt), np.uint64(0))
                    base = base + offs
                elif is_hot.any():
                    # replicate hot RIGHT rows into all `salt` buckets
                    rep = df[is_hot]
                    rep_base = base[is_hot]
                    parts = [df.assign(__bucket=(base % num_buckets)
                                       .astype("int32"))]
                    for s in range(1, salt):
                        parts.append(rep.assign(
                            __bucket=((rep_base + np.uint64(s)) % num_buckets)
                            .astype("int32")))
                    df = pd.concat(parts, ignore_index=True)
                    df["__side"] = np.int8(side)
                    for c in all_cols:
                        if c not in df.columns:
                            df[c] = None
                    return df[all_cols + ["__bucket", "__side"]]
            df["__bucket"] = (base % num_buckets).astype("int32")
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
        if dedup_cols:
            lhs = lhs.drop_duplicates(dedup_cols)
        rhs = df.loc[df["__side"] == 1, keep_r]
        merged = lhs.merge(rhs, on=left_on, how=how)
        return bucket_fn(merged) if bucket_fn is not None else merged

    # NOT compacted like partial_aggregate's partials: a same-window
    # A/B on the minhash verify chain read 8.6/7.0 s before vs
    # 9.1/7.5 s with a materialize+compact here — join inputs carry
    # real payload columns, so the extra object-store round trip costs
    # more than the block-count saving buys
    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def semi_anti_filter_scalable(ds: rd.Dataset, key: str, keys: rd.Dataset,
                              key_col: Optional[str] = None,
                              anti: bool = False,
                              m_bits: int = 1 << 23, k: int = 4,
                              num_buckets: Optional[int] = None,
                              cols: Optional[Sequence[str]] = None,
                              keys_unique: bool = False) -> rd.Dataset:
    """EXACT semi/anti join against a key DATASET of any size — the
    scale path for semi_anti_filter, whose broadcast frozenset is
    bounded by driver/worker memory (at 10^12 docs the resume anti-join
    key set no longer broadcasts).

    Two stages, both distributed:
    1. a tree-merged Bloom filter of the key side (1 MiB default) is
       ray.put once; every batch resolves its DEFINITE rows locally —
       bloom-miss rows are certainly not in `keys` (kept for anti,
       dropped for semi). With a few-percent FP rate, ~all of the
       non-matching corpus never enters the join.
    2. only the bloom-HIT rows (true matches + FPs) go through the
       partitioned hash join for exact resolution.

    Output = certain ∪ exactly-resolved; bit-exact vs semi_anti_filter
    (tested side-by-side incl. a forced-FP tiny filter)."""
    from .sketches import bloom_from_dataset, bloom_might_contain

    key_col = key_col or key
    # `cols` skips the schema probe for lazy TRANSFORMED inputs, where
    # Dataset.schema() partially executes the upstream plan (the same
    # hint mechanism as hash_join's left_cols/right_cols)
    ds_cols = list(cols) if cols is not None else list(ds.schema().names)
    keys = keys.select_columns([key_col]).materialize()  # reused 2x
    if keys.count() == 0:  # metadata-only on a materialized dataset
        # empty key side: anti keeps everything, semi keeps nothing
        return ds if anti else ds.limit(0)
    bloom = ray.put(bloom_from_dataset(keys, key_col, m_bits=m_bits, k=k))

    def split(certain_side: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            maybe = bloom_might_contain(df[key], ray.get(bloom), m_bits, k)
            return df[~maybe] if certain_side else df[maybe]
        return fn

    uncertain = ds.map_batches(split(False), batch_format="pandas")
    # GLOBAL key dedup before the left join — a key present in several
    # right-side blocks would otherwise multiply matched left rows.
    # ``keys_unique=True`` (caller guarantees one row per key — e.g. the
    # key side is itself a groupby/distinct output) skips that bucketed
    # exchange entirely: the mark column is added in-place, streaming.
    if keys_unique:
        marked = keys.map_batches(
            lambda df: df.assign(__m=np.int64(1)), batch_format="pandas")
    else:
        marked = partial_aggregate(keys, [key_col], {"__m": ("count", None)},
                                   num_buckets=num_buckets)
    joined = hash_join(uncertain, marked, key, key_col, how="left",
                       num_buckets=num_buckets,
                       left_cols=ds_cols,
                       right_cols=[key_col, "__m"])

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        hit = df["__m"].notna().to_numpy()
        out = df[~hit] if anti else df[hit]
        return out.drop(columns="__m").infer_objects()

    resolved = joined.map_batches(resolve, batch_format="pandas")
    if anti:
        certain = ds.map_batches(split(True), batch_format="pandas")
        return certain.union(resolved)
    return resolved


def semi_anti_filter(ds: rd.Dataset, key: str, key_set, anti: bool = False) -> rd.Dataset:
    """Semi/anti join via a broadcast key set (M9 resume anti-join).
    Bounded by the key set fitting the object store + one worker heap;
    semi_anti_filter_scalable is the unbounded-key-side variant. The
    membership test is one pc.is_in kernel per batch (the value set is
    an Arrow array broadcast once), never a per-row Python loop."""
    vals = list(frozenset(key_set))
    if not vals:  # empty key side: anti keeps everything, semi nothing
        return ds if anti else ds.limit(0)
    ref = ray.put(pa.array(vals))

    def fn(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        col = t.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if vs.type != col.type:
            vs = vs.cast(col.type)
        mask = pc.is_in(col, value_set=vs)
        return t.filter(pc.invert(mask) if anti else mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def global_value_rank(ds: rd.Dataset, value_col: str, id_col: str,
                      descending: bool = True, num_bins: int = 1024,
                      num_buckets: Optional[int] = None) -> rd.Dataset:
    """EXACT global ORDER-BY ranking over an INTEGER value column with
    NO global sort — the distributed ORDER BY operator (classic
    range-partition sort with an exact histogram partitioner):

    1. bounds pass: global (min, max) of the value — one partial row
       per block through the constant-group aggregate;
    2. histogram pass: per-bin counts (bin = (v - min) // width) via
       the bucketed partial aggregate — ≤ num_bins rows reach the
       driver, prefix-summed into per-bin rank offsets in rank order;
    3. placement pass: rows exchange on their BIN only (each bin's rows
       meet in one task — ~n/num_bins rows for non-degenerate
       distributions), sort locally by (value, id) and add the bin's
       offset. At 100 TB pick num_bins ≥ cluster task slots and
       re-split a degenerate bin by id range; a single-value bin is
       still CORRECT here (one task sorts it), just unbalanced.

    Ties are impossible across bins (bins partition the value space);
    within a bin (value, id) is a total order, so the result equals
    ``row_number() OVER (ORDER BY v [DESC], id)`` exactly — all-integer
    and block-layout independent. The input is consumed three times, so
    the narrow (id, value) projection is materialized once (the
    bm25/per_doc trade). Returns (id_col, value_col, rank)."""
    proj = ds.map_batches(lambda df: df[[id_col, value_col]],
                          batch_format="pandas").materialize()

    bounds = partial_aggregate(
        proj.map_batches(lambda df: df.assign(__g=np.int32(0)),
                         batch_format="pandas"),
        ["__g"], {"mn": ("min", value_col), "mx": ("max", value_col)},
        num_buckets=num_buckets).to_pandas()
    if not len(bounds):
        return proj.map_batches(
            lambda df: df.assign(rank=np.int64(0)).iloc[:0],
            batch_format="pandas")
    mn, mx = int(bounds["mn"][0]), int(bounds["mx"][0])
    width = max(1, (mx - mn) // num_bins + 1)

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        return df.assign(__bin=((v - mn) // width).astype(np.int64))

    hist = partial_aggregate(
        proj.map_batches(binned, batch_format="pandas"),
        ["__bin"], {"n": ("count", None)},
        num_buckets=num_buckets).to_pandas()
    hist = hist.sort_values("__bin", ascending=not descending,
                            ignore_index=True)
    offs = dict(zip(hist["__bin"].astype(int),
                    np.concatenate([[0], np.cumsum(
                        hist["n"].to_numpy(dtype=np.int64))[:-1]])))
    oref = ray.put(offs)

    def rank_bin(df: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(oref)
        df = df.sort_values([value_col, id_col],
                            ascending=[not descending, True],
                            ignore_index=True)
        df["rank"] = (np.arange(1, len(df) + 1, dtype=np.int64)
                      + int(o[int(df["__bin"].iloc[0])]))
        return df[[id_col, value_col, "rank"]]

    return (proj.map_batches(binned, batch_format="pandas")
            .groupby("__bin").map_groups(rank_bin, batch_format="pandas"))


def ntile_from_rank(rank: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE(tiles) bucket for 1-based global ranks over n rows:
    the first n % tiles buckets hold ceil(n/tiles) rows, the rest
    floor(n/tiles) — exactly the ANSI semantics (unit-tested against
    DuckDB's ntile for ragged n). Pure arithmetic, no data movement."""
    q, r = divmod(n, tiles)
    p = np.asarray(rank, dtype=np.int64) - 1
    cut = (q + 1) * r
    return (np.where(p < cut, p // max(q + 1, 1),
                     r + (p - cut) // max(q, 1)) + 1).astype(np.int64)


def exact_order_statistic(ds: rd.Dataset, value_col: str, k: int,
                          bin_width: int = 64,
                          num_buckets: Optional[int] = None) -> int:
    """EXACT k-th smallest (1-based) value of an integer column in two
    bounded distributed passes — the single-group generalization of the
    grouped-median shape (queries.median_value_by_type), used for
    quantile-threshold selection (perplexity filtering: "keep every doc
    scoring at or below the p-quantile") with NO global sort:

    1. histogram pass: bucketed counts of value // bin_width — the
       driver sees only the bin table (≤ value-range / bin_width rows,
       independent of row count);
    2. exact pass: per-value counts INSIDE the single rank-holding bin
       — ≤ bin_width distinct values cross the wire.

    Raises ValueError when k is outside [1, row count]."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bin": v // bin_width})

    hist = (partial_aggregate(ds.map_batches(binned, batch_format="pandas"),
                              ["bin"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values("bin", ignore_index=True))
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    if k > n:
        raise ValueError(f"k={k} exceeds row count {n}")
    i = int(np.searchsorted(cum, k))
    b = int(hist["bin"][i])
    below = int(cum[i - 1]) if i else 0

    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"v": v[v // bin_width == b]})

    vals = (partial_aggregate(ds.map_batches(in_bin, batch_format="pandas"),
                              ["v"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values("v", ignore_index=True))
    j = int(np.searchsorted(vals["cnt"].cumsum().to_numpy(), k - below))
    return int(vals["v"][j])


def grouped_quantile_thresholds(ds: rd.Dataset, group_col: str,
                                value_col: str, q_num: int, q_den: int,
                                bin_width: int = 64,
                                num_buckets: Optional[int] = None) -> dict:
    """EXACT per-group q-quantile value (the value at ascending rank
    ceil(q * n_g) within each group) of an integer column — the grouped
    generalization of exact_order_statistic, same two bounded passes:

    1. grouped histogram: (group, value // bin_width) counts — the
       driver sees #groups × bins rows, independent of row count;
    2. exact pass inside each group's single rank-holding bin (the
       per-group bin map broadcasts via ray.put): (group, value) counts
       for ≤ bin_width values per group cross the wire.

    Group count must be driver-small (languages, sources, event types —
    the per-group QUANTILE table is the output); per-group row counts
    are unbounded and never materialize anywhere. Returns
    {group: threshold}."""
    import ray

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df[group_col].to_numpy(),
            "bin": df[value_col].to_numpy(dtype=np.int64) // bin_width})

    hist = (partial_aggregate(ds.map_batches(binned, batch_format="pandas"),
                              ["g", "bin"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values(["g", "bin"], ignore_index=True))

    rank_bin, residual = {}, {}
    for g, sub in hist.groupby("g", sort=False):
        cum = sub["cnt"].cumsum().to_numpy()
        n_g = int(cum[-1])
        k = (n_g * q_num + q_den - 1) // q_den  # ceil(q * n), 1-based
        i = int(np.searchsorted(cum, max(k, 1)))
        rank_bin[g] = int(sub["bin"].iloc[i])
        residual[g] = max(k, 1) - (int(cum[i - 1]) if i else 0)
    bin_ref = ray.put(rank_bin)

    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        bins = ray.get(bin_ref)
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy(dtype=np.int64)
        want = np.fromiter((bins.get(x, -1) for x in g), dtype=np.int64,
                           count=len(g))
        m = v // bin_width == want
        return pd.DataFrame({"g": g[m], "v": v[m]})

    vals = (partial_aggregate(ds.map_batches(in_bin, batch_format="pandas"),
                              ["g", "v"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values(["g", "v"], ignore_index=True))
    out = {}
    for g, sub in vals.groupby("g", sort=False):
        j = int(np.searchsorted(sub["cnt"].cumsum().to_numpy(), residual[g]))
        out[g] = int(sub["v"].iloc[j])
    return out


def grouped_percentile_filter(ds: rd.Dataset, group_col: str,
                              value_col: str, q_num: int, q_den: int,
                              bin_width: int = 64,
                              num_buckets: Optional[int] = None,
                              keep: str = "ge") -> rd.Dataset:
    """Keep each group's rows at or above (``keep='ge'``; ``'le'`` for
    at-or-below) the group's exact q-quantile value — the per-language
    quality-cutoff shape of corpus curation ("drop the shortest quartile
    of every language", CCNet-style perplexity tails), with no global
    sort and nothing group-sized on any worker. One streaming filter
    pass after the two bounded threshold passes above."""
    import ray

    thr = grouped_quantile_thresholds(ds, group_col, value_col, q_num,
                                      q_den, bin_width, num_buckets)
    thr_ref = ray.put(thr)

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy(dtype=np.int64)
        cut = np.fromiter((t[x] for x in g), dtype=np.int64, count=len(g))
        m = v >= cut if keep == "ge" else v <= cut
        return df[m]

    return ds.map_batches(flt, batch_format="pandas")


def grouped_kth_from_top(ds: rd.Dataset, group_col: str, value_col: str,
                         k: int, bin_width: int = 64,
                         num_buckets: Optional[int] = None) -> dict:
    """EXACT per-group k-th LARGEST value (duplicates counted; groups
    with fewer than k rows yield their minimum) of an integer column —
    the threshold that makes RANK()-with-ties top-k a streaming filter:
    rank(x) <= k  ⟺  x >= (k-th largest value of the group), so one
    broadcast {group: threshold} map turns "top k with ties per group"
    into a map_batches filter with NO per-group sort and nothing
    group-sized on any worker.

    Same two bounded passes as grouped_quantile_thresholds (grouped
    histogram -> exact pass inside each group's single rank-holding
    bin); the only difference is the target rank arithmetic
    (ascending rank max(n_g - k + 1, 1) instead of ceil(q * n_g))."""
    import ray

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "g": df[group_col].to_numpy(),
            "bin": df[value_col].to_numpy(dtype=np.int64) // bin_width})

    hist = (partial_aggregate(ds.map_batches(binned, batch_format="pandas"),
                              ["g", "bin"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values(["g", "bin"], ignore_index=True))

    rank_bin, residual = {}, {}
    for g, sub in hist.groupby("g", sort=False):
        cum = sub["cnt"].cumsum().to_numpy()
        n_g = int(cum[-1])
        kk = max(n_g - k + 1, 1)  # ascending rank of the k-th largest
        i = int(np.searchsorted(cum, kk))
        rank_bin[g] = int(sub["bin"].iloc[i])
        residual[g] = kk - (int(cum[i - 1]) if i else 0)
    bin_ref = ray.put(rank_bin)

    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        bins = ray.get(bin_ref)
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy(dtype=np.int64)
        want = np.fromiter((bins.get(x, -(1 << 62)) for x in g),
                           dtype=np.int64, count=len(g))
        m = v // bin_width == want
        return pd.DataFrame({"g": g[m], "v": v[m]})

    vals = (partial_aggregate(ds.map_batches(in_bin, batch_format="pandas"),
                              ["g", "v"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values(["g", "v"], ignore_index=True))
    out = {}
    for g, sub in vals.groupby("g", sort=False):
        j = int(np.searchsorted(sub["cnt"].cumsum().to_numpy(), residual[g]))
        out[g] = int(sub["v"].iloc[j])
    return out


def exact_median(ds: rd.Dataset, value_col: str, bin_width: int = 64,
                 num_buckets: Optional[int] = None) -> tuple:
    """EXACT lower median (k = (n+1)//2, the mad_outliers / grouped-
    median rule) of an integer column, plus the row count, in the SAME
    two bounded passes as exact_order_statistic — but without a
    separate count() pass, because the histogram's total IS n. Returns
    (median, n); raises ValueError on an empty column."""

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bin": v // bin_width})

    hist = partial_aggregate(ds.map_batches(binned, batch_format="pandas"),
                             ["bin"], {"cnt": ("count", None)},
                             num_buckets=num_buckets).to_pandas()
    if hist.empty:  # empty input: the aggregate comes back columnless
        raise ValueError("exact_median of an empty column")
    hist = hist.sort_values("bin", ignore_index=True)
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    k = (n + 1) // 2
    i = int(np.searchsorted(cum, k))
    b = int(hist["bin"][i])
    below = int(cum[i - 1]) if i else 0

    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"v": v[v // bin_width == b]})

    vals = (partial_aggregate(ds.map_batches(in_bin, batch_format="pandas"),
                              ["v"], {"cnt": ("count", None)},
                              num_buckets=num_buckets)
            .to_pandas().sort_values("v", ignore_index=True))
    j = int(np.searchsorted(vals["cnt"].cumsum().to_numpy(), k - below))
    return int(vals["v"][j]), n
