"""Mergeable sketches for approximate aggregates at scale.

The scale shape (SCALE.md §sketches): one serialized sketch per batch emitted
from map_batches, merged in a tiny second stage — the all-to-all moves
registers, never rows. The reference has no sketches (SURVEY.md §2.5);
this is part of the training-data toolkit.

HyperLogLog per Flajolet et al. 2007, with the standard small-range
(linear counting) correction. Hashing is pandas' 64-bit siphash
(deterministic within a pandas version), vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = {16: 0.673, 32: 0.697, 64: 0.709}[self.m]

    def add_hashes(self, h: np.ndarray) -> None:
        """Add pre-hashed uint64 values (vectorized)."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rank = leading-zero count of the low 64-p bits + 1
        #      = (64-p) - bit_length(w) + 1. bit_length is computed
        # integer-exactly by splitting w into 32-bit halves (each half
        # fits a float64 mantissa, so frexp's exponent IS bit_length —
        # no rounding near powers of two even at small p).
        hi = (w >> np.uint64(32)).astype(np.float64)
        lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
        _, ehi = np.frexp(hi)
        _, elo = np.frexp(lo)
        bl = np.where(hi > 0, ehi + 32, elo)  # exact bit_length(w)
        rank = ((64 - self.p) - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> int:
        est = self.alpha * self.m**2 / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * self.m and zeros:
            est = self.m * np.log(self.m / zeros)  # linear counting
        return int(round(est))


def _premerge_buckets(payload_col: str, n_buckets: int = 64):
    """Deterministic bucket tag for sketch rows (md5 of the payload
    bytes — sketch batches are 1-row, so a within-batch round-robin
    would put every sketch in bucket 0; the content hash spreads them.
    Payloads may be raw non-utf8 bytes, hence md5 over bytes rather
    than a pandas string hash)."""
    import hashlib

    def _h(v) -> int:
        b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        return int.from_bytes(hashlib.md5(b).digest()[:4], "big")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df[payload_col].map(_h).to_numpy().astype(np.int64)
                     % n_buckets).astype("int32")
        return df
    return tag


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12,
                    premerge_buckets: int = 64) -> int:
    """Approximate COUNT(DISTINCT col): per-batch HLL registers (one
    m-byte row per batch crosses the wire), tree-merged — a bucketed
    pre-merge stage collapses the per-block sketches to ≤
    ``premerge_buckets`` rows (register max is associative/commutative,
    so the estimate is IDENTICAL to a flat merge), and the driver merges
    only those. At 100 TB that is ~64 rows through the driver instead of
    one per input block (VERDICT r2 #2)."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        hll = HyperLogLog(p)
        hll.add_hashes(pd.util.hash_pandas_object(df[col].astype(str),
                                                  index=False).to_numpy())
        return pd.DataFrame({"registers": [hll.registers.tobytes()]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for raw in df["registers"]:
            np.maximum(regs, np.frombuffer(raw, dtype=np.uint8), out=regs)
        return pd.DataFrame({"registers": [regs.tobytes()]})

    parts = (ds.map_batches(sketch, batch_format="pandas")
             .map_batches(_premerge_buckets("registers", premerge_buckets),
                          batch_format="pandas")
             .groupby("__b")
             .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                         batch_format="pandas"))
    merged = HyperLogLog(p)
    for row in parts.take_all():  # ≤ premerge_buckets rows
        other = HyperLogLog(p)
        other.registers = np.frombuffer(row["registers"], dtype=np.uint8).copy()
        merged.merge(other)
    return merged.estimate()


def misra_gries_merge(summaries, k: int):
    """Merge Misra-Gries summaries (dicts) with capacity k-1: pairwise
    merge = add counts, then subtract the (k)th-largest count from all
    and drop non-positives — preserves the standard guarantee: every
    item with true frequency > n/k survives, counts underestimate by
    at most n/k."""
    from collections import Counter

    total: Counter = Counter()
    for s in summaries:
        total.update(s)
    if len(total) < k:
        return dict(total)
    cut = sorted(total.values(), reverse=True)[k - 1]
    return {key: c - cut for key, c in total.items() if c - cut > 0}


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 20,
                  premerge_buckets: int = 64) -> pd.DataFrame:
    """Approximate heavy hitters over a column: one (k-1)-entry
    Misra-Gries summary per batch crosses the wire (never rows),
    tree-merged — a bucketed pre-merge collapses per-block summaries to
    ≤ ``premerge_buckets`` before the driver merge (MG summaries are
    mergeable with the error bound intact — Agarwal et al. 2012,
    "Mergeable Summaries" — so the n/k guarantee survives the tree).
    Guarantee: any value with frequency > n/k appears in the output;
    returned counts are lower bounds within n/k of truth. Candidate set
    depends on block partitioning (the MG decrement order) —
    approximate by design, gated by tests/test_sketches.py."""
    import json
    from collections import Counter

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()  # vectorized per-batch count
        if len(vc) >= k:
            cut = int(vc.iloc[k - 1])  # value_counts is descending
            vc = (vc - cut)[vc - cut > 0]
        counts = {str(key): int(c) for key, c in vc.items()}
        return pd.DataFrame({"summary": [json.dumps(dict(counts))]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        merged = misra_gries_merge([json.loads(s) for s in df["summary"]], k)
        return pd.DataFrame({"summary": [json.dumps(merged)]})

    parts_ds = (ds.map_batches(sketch, batch_format="pandas")
                .map_batches(_premerge_buckets("summary", premerge_buckets),
                             batch_format="pandas")
                .groupby("__b")
                .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                            batch_format="pandas"))
    parts = [json.loads(row["summary"]) for row in parts_ds.take_all()]
    merged = misra_gries_merge(parts, k)
    out = pd.DataFrame({col: list(merged.keys()),
                        "min_count": np.array(list(merged.values()),
                                              dtype=np.int64)})
    return out.sort_values(["min_count", col], ascending=[False, True],
                           ignore_index=True)


# ------------------------------------------------------------ bloom

def _bloom_indices(values: pd.Series, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing of the stringified key:
    idx_i = (h1 + i*h2) mod m (Kirsch-Mitzenmacher)."""
    h1 = pd.util.hash_pandas_object(values.astype(str),
                                    index=False).to_numpy().astype(np.uint64)
    # independent-ish second hash: multiply-xorshift mix of h1
    h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ (h1 >> np.uint64(29))
    h2 |= np.uint64(1)  # odd, so strides cover the table
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def bloom_from_dataset(ds: rd.Dataset, col: str, m_bits: int = 1 << 23,
                       k: int = 4, premerge_buckets: int = 64) -> bytes:
    """Distributed Bloom-filter build over a key column: per-batch
    partial bitmaps, tree-merged (bitwise OR is associative/commutative,
    same shape as the HLL pre-merge) so the driver ORs ≤
    ``premerge_buckets`` bitmaps, never one per block. Returns the
    packed bitmap bytes (m_bits/8; default 1 MiB)."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if len(df):
            idx = _bloom_indices(df[col], m_bits, k).reshape(-1)
            np.bitwise_or.at(bits, idx // 8,
                             np.uint8(1) << (idx % 8).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for raw in df["bits"]:
            np.bitwise_or(acc, np.frombuffer(raw, dtype=np.uint8), out=acc)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    parts = (ds.map_batches(sketch, batch_format="pandas")
             .map_batches(_premerge_buckets("bits", premerge_buckets),
                          batch_format="pandas")
             .groupby("__b")
             .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                         batch_format="pandas"))
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts.take_all():  # ≤ premerge_buckets rows
        np.bitwise_or(acc, np.frombuffer(row["bits"], dtype=np.uint8), out=acc)
    return acc.tobytes()


def bloom_might_contain(values: pd.Series, bloom: bytes, m_bits: int,
                        k: int = 4) -> np.ndarray:
    """Vectorized membership test: True = maybe present (FP rate ≈
    (1-e^{-kn/m})^k), False = DEFINITELY absent."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bloom, dtype=np.uint8)
    idx = _bloom_indices(values, m_bits, k)
    hit = (bits[idx // 8] >> (idx % 8).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=1).astype(bool)


# --------------------------------------------------- count-min sketch

def _cms_cells(values: pd.Series, width: int, depth: int) -> np.ndarray:
    """(depth, len) array of cell indices — row d uses md5('{d}|' + v),
    so the rows are independent hash functions (same trick as the
    Bloom filter's _bloom_indices). md5 runs once per UNIQUE value per
    batch (the simhash pattern); DuckDB recomputes the same cells via
    ('0x' || substr(md5(...), 1, 16))::UBIGINT % width."""
    import hashlib

    svals = values.astype(str).to_numpy()
    uniq, inv = np.unique(svals, return_inverse=True)
    out = np.empty((depth, len(uniq)), dtype=np.int64)
    for d in range(depth):
        pre = f"{d}|".encode("utf-8")
        out[d] = np.fromiter(
            (int.from_bytes(hashlib.md5(pre + v.encode("utf-8"))
                            .digest()[:8], "big") % width for v in uniq),
            dtype=np.int64, count=len(uniq))
    return out[:, inv]


def count_min_build(ds: rd.Dataset, col: str, width: int = 2048,
                    depth: int = 4, premerge_buckets: int = 64) -> np.ndarray:
    """Count-min sketch of value frequencies (Cormode & Muthukrishnan
    2005): per-batch (depth, width) int64 grids, tree-merged — cell-wise
    ADD is associative/commutative, so the bucketed pre-merge stage
    (same shape as approx_distinct's) collapses per-block grids to ≤
    ``premerge_buckets`` rows and the driver sums only those. Point
    query = min over rows; estimate is NEVER below the true count and
    exceeds it by ≤ e·N/width with prob ≥ 1-e^-depth (guarantee-gated
    in tests). Returns the merged (depth, width) grid."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros((depth, width), dtype=np.int64)
        if len(df):
            cells = _cms_cells(df[col], width, depth)
            for d in range(depth):
                np.add.at(grid[d], cells[d], 1)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(depth * width, dtype=np.int64)
        for raw in df["grid"]:
            acc += np.frombuffer(raw, dtype=np.int64)
        return pd.DataFrame({"grid": [acc.tobytes()]})

    parts = (ds.map_batches(sketch, batch_format="pandas")
             .map_batches(_premerge_buckets("grid", premerge_buckets),
                          batch_format="pandas")
             .groupby("__b")
             .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                         batch_format="pandas"))
    total = np.zeros(depth * width, dtype=np.int64)
    for row in parts.take_all():  # ≤ premerge_buckets rows
        total += np.frombuffer(row["grid"], dtype=np.int64)
    return total.reshape(depth, width)


def count_min_query(grid: np.ndarray, values: pd.Series) -> np.ndarray:
    """Point-estimate each value's frequency: min over the depth rows."""
    depth, width = grid.shape
    cells = _cms_cells(values, width, depth)
    return np.min(np.stack([grid[d][cells[d]] for d in range(depth)]),
                  axis=0)


def detect_hot_keys(ds: rd.Dataset, col: str, num_buckets: int,
                    factor: float = 4.0, width: int = 4096,
                    depth: int = 4, premerge_buckets: int = 64) -> list:
    """Hot join keys in ONE fused distributed sketch pass — the skew
    pre-pass behind hash_join(auto_salt=True). Per batch: a Misra-Gries
    candidate summary, a count-min grid, and the row count ride one
    emit; the bucketed pre-merge collapses them tree-wise so the driver
    folds ≤ premerge_buckets rows regardless of block count.

    A key is hot when its estimated frequency exceeds
    ``factor · n / num_buckets`` (it would overload its single join
    bucket by ≥ factor×). MG with k ≥ 2·num_buckets/factor guarantees
    every such key survives as a candidate; the CMS estimate NEVER
    undercounts, so no true hot key is missed (a near-threshold
    false positive just gets harmlessly salted). Returns the hot keys
    as STRINGS (hash_join compares key string forms)."""
    import json

    k = max(64, int(np.ceil(num_buckets / max(factor, 1e-9))) * 2)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        sv = df[col].astype(str)
        vc = sv.value_counts()
        if len(vc) >= k:
            cut = int(vc.iloc[k - 1])
            vc = (vc - cut)[vc - cut > 0]
        grid = np.zeros((depth, width), dtype=np.int64)
        if len(df):
            cells = _cms_cells(sv, width, depth)
            for d in range(depth):
                np.add.at(grid[d], cells[d], 1)
        return pd.DataFrame({
            "summary": [json.dumps({str(i): int(c) for i, c in vc.items()})],
            "grid": [grid.tobytes()],
            "n_rows": [len(df)]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        merged = misra_gries_merge([json.loads(s) for s in df["summary"]], k)
        acc = np.zeros(depth * width, dtype=np.int64)
        for raw in df["grid"]:
            acc += np.frombuffer(raw, dtype=np.int64)
        return pd.DataFrame({"summary": [json.dumps(merged)],
                             "grid": [acc.tobytes()],
                             "n_rows": [int(df["n_rows"].sum())]})

    rows = (ds.map_batches(sketch, batch_format="pandas")
            .map_batches(_premerge_buckets("grid", premerge_buckets),
                         batch_format="pandas")
            .groupby("__b")
            .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                        batch_format="pandas")).take_all()
    n = int(sum(r["n_rows"] for r in rows))
    if n == 0:
        return []
    cand = list(misra_gries_merge(
        [json.loads(r["summary"]) for r in rows], k).keys())
    if not cand:
        return []
    grid = np.zeros(depth * width, dtype=np.int64)
    for r in rows:
        grid += np.frombuffer(r["grid"], dtype=np.int64)
    est = count_min_query(grid.reshape(depth, width), pd.Series(cand))
    thresh = factor * n / num_buckets
    return [c for c, e in zip(cand, est) if e > thresh]


# ------------------------------------------- exact two-pass heavy hitters

def heavy_hitters_exact(ds: rd.Dataset, col: str, k: int = 20,
                        premerge_buckets: int = 64) -> pd.DataFrame:
    """EXACT heavy hitters (every value with frequency strictly greater
    than n/k, with its exact count) in two bounded passes — the classic
    sketch-then-verify upgrade of ``heavy_hitters``:

    1. the Misra-Gries candidate sweep above (one ≤(k-1)-entry summary
       per batch crosses the wire; the MG guarantee says every true
       heavy hitter survives the tree merge), which also yields the
       exact total row count n from the same pass's partials;
    2. an exact count restricted to the ≤k-1 broadcast candidates — a
       per-batch combiner emits ≤k-1 partial rows per block, so the
       second pass is another sketch-sized exchange, never a full
       token-frequency shuffle.

    Unlike ``heavy_hitters`` the output is partition-layout independent
    and SQL-exact (GROUP BY HAVING cnt*k > n): the MG decrement order
    only affects which NON-hitters appear as candidates, and those are
    removed by the exact filter. Returns (col, cnt) sorted by
    (-cnt, col)."""
    import json
    from collections import Counter

    # pass 1: MG candidates + exact n, fused into one scan (summary and
    # row-count partials ride the same per-batch emit)
    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()  # vectorized per-batch count
        if len(vc) >= k:
            cut = int(vc.iloc[k - 1])  # value_counts is descending
            vc = (vc - cut)[vc - cut > 0]
        counts = {str(key): int(c) for key, c in vc.items()}
        return pd.DataFrame({"summary": [json.dumps(dict(counts))],
                             "n_rows": [len(df)]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        merged = misra_gries_merge([json.loads(s) for s in df["summary"]], k)
        return pd.DataFrame({"summary": [json.dumps(merged)],
                             "n_rows": [int(df["n_rows"].sum())]})

    parts_ds = (ds.map_batches(sketch, batch_format="pandas")
                .map_batches(_premerge_buckets("summary", premerge_buckets),
                             batch_format="pandas")
                .groupby("__b")
                .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                            batch_format="pandas"))
    rows = parts_ds.take_all()  # ≤ premerge_buckets rows
    n_total = int(sum(r["n_rows"] for r in rows))
    cand = set(misra_gries_merge([json.loads(r["summary"]) for r in rows],
                                 k).keys())
    if not cand:
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype=np.int64)})

    # pass 2: exact counts of the candidates only (broadcast set — ≤k-1
    # entries, read once per task via ray.put)
    import ray
    cand_ref = ray.put(cand)

    def count_cands(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        # candidates are STRINGIFIED (MG summaries are JSON keys), so
        # membership compares on the stringified column — a non-string
        # col (int ids) would otherwise silently match nothing
        sub = df[df[col].astype(str).isin(cs)]
        g = sub.groupby(col, sort=False).size()
        return pd.DataFrame({col: g.index.to_numpy(),
                             "cnt": g.to_numpy(dtype=np.int64)})

    from .relops import partial_aggregate
    exact = partial_aggregate(
        ds.map_batches(count_cands, batch_format="pandas"),
        [col], {"cnt": ("sum", "cnt")}).to_pandas()
    out = exact[exact["cnt"].to_numpy(dtype=np.int64) * k > n_total]
    return (out.astype({"cnt": np.int64})
            .sort_values(["cnt", col], ascending=[False, True],
                         ignore_index=True))


# ------------------------------------------- SQL-parity HLL registers

HLL_MD5_TAIL_BITS = 64  # first 16 md5 hex chars = big-endian 64-bit hash


def _md5_hll_parts(values, p: int) -> tuple:
    """(idx, rho) arrays for the md5-variant HLL: h = first 8 md5 bytes
    of str(v) (big-endian — identical to SQL's
    CAST('0x'||substr(md5(v),1,16) AS UBIGINT)); idx = top p bits,
    rho = 1 + leading zeros of the remaining (64-p) bits (tail=0 → 65-p).
    Exact integer math: tails < 2^52 are exactly representable, and
    np.frexp's exponent IS the bit length (no log2 rounding risk)."""
    import hashlib

    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode("utf-8")).digest()[:8],
                        "big") for v in values),
        dtype=np.uint64, count=len(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int32)
    tail = h & np.uint64((1 << (64 - p)) - 1)
    # bit length via frexp on exact float64 (tail < 2^52 when p >= 12)
    assert p >= 12, "tail must stay under 2^52 for exact float64 bit length"
    _, exp = np.frexp(tail.astype(np.float64))
    rho = np.where(tail == 0, 64 - p + 1, 64 - p + 1 - exp).astype(np.int32)
    return idx, rho


def hll_register_table(ds: rd.Dataset, col: str, p: int = 12,
                       premerge_buckets: int = 64) -> pd.DataFrame:
    """The HLL register table itself, made driver-visible and SQL-exact:
    same distributed shape as ``approx_distinct`` (one m-byte register
    row per batch, bucketed pre-merge, driver merges ≤premerge_buckets
    rows) but with an md5-derived hash so DuckDB can recompute every
    register bit-for-bit (queries.ORACLE_SQL['hll_user_registers']) —
    the value check the estimate-only query can't have. Returns all
    2^p rows (idx, register), zeros included."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        if len(df):
            idx, rho = _md5_hll_parts(df[col].astype(str).to_numpy(), p)
            np.maximum.at(regs, idx, rho.astype(np.uint8))
        return pd.DataFrame({"registers": [regs.tobytes()]})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for raw in df["registers"]:
            np.maximum(regs, np.frombuffer(raw, dtype=np.uint8), out=regs)
        return pd.DataFrame({"registers": [regs.tobytes()]})

    parts = (ds.map_batches(sketch, batch_format="pandas")
             .map_batches(_premerge_buckets("registers", premerge_buckets),
                          batch_format="pandas")
             .groupby("__b")
             .map_groups(lambda df: merge_bucket(df.drop(columns="__b")),
                         batch_format="pandas"))
    regs = np.zeros(1 << p, dtype=np.uint8)
    for row in parts.take_all():  # ≤ premerge_buckets rows
        np.maximum(regs, np.frombuffer(row["registers"], dtype=np.uint8),
                   out=regs)
    return pd.DataFrame({"idx": np.arange(1 << p, dtype=np.int32),
                         "register": regs.astype(np.int32)})
