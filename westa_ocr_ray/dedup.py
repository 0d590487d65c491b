"""Deduplication operators over a (id, text) document table.

All Ray-Data-first: vectorized per-batch signature computation, shuffles
only on small derived keys (hashes / band buckets), never on raw text
except where the verify step genuinely needs it.

- exact: content-hash groupby, first-wins (reference idempotency
  semantics, app/main.py:157-188 / repository.py:256-262).
- minhash_lsh: shingle → minhash → banded LSH buckets → candidate pairs
  → exact-Jaccard verification.
- simhash: 64-bit token-weight fingerprint per doc.
- ngram_jaccard: blocked pairwise n-gram Jaccard.
- embedding near-dup: cosine over an embedding column (see similarity.py
  for the search variant).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List

import numpy as np
import pandas as pd
import ray.data as rd

from .relops import partial_aggregate, semi_anti_filter

_MERSENNE = (1 << 61) - 1


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------- exact


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """(text_hash, keeper_doc_id, n_dups): hash-partitioned first-wins
    exact dedup. Only (hash, id) pairs shuffle — the text stays put."""

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_hash": [md5_hex(t) for t in df[text_col]],
            id_col: df[id_col].to_numpy(),
        })

    signed = ds.map_batches(sign, batch_format="pandas")
    out = partial_aggregate(signed, ["text_hash"],
                            {"keeper_doc_id": ("min", id_col),
                             "n_dups": ("count", None)})
    return out


def prefix_dedup_groups(ds: rd.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", n_tokens: int = 4) -> rd.Dataset:
    """Near-dup *blocking*: group docs by the hash of their first
    n_tokens tokens — the candidate-generation half of fuzzy dedup."""

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        pref = [" ".join(t.split(" ")[:n_tokens]) for t in df[text_col]]
        return pd.DataFrame({"prefix_hash": [md5_hex(p) for p in pref],
                             id_col: df[id_col].to_numpy()})

    return partial_aggregate(ds.map_batches(sign, batch_format="pandas"),
                             ["prefix_hash"],
                             {"keeper_doc_id": ("min", id_col),
                              "n_docs": ("count", None)})


# -------------------------------------------------------------- minhash


class MinHasher:
    """Stateful signature stage: permutation parameters are derived once
    per actor (deterministic from seed), applied vectorized per batch."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 42,
                 bands: int = 16, id_col: str = "doc_id", text_col: str = "text") -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm, self.shingle, self.bands = num_perm, shingle, bands
        self.rows_per_band = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        toks = text.split(" ")
        sh = {" ".join(toks[i:i + self.shingle])
              for i in range(max(1, len(toks) - self.shingle + 1))}
        h = np.fromiter((_crc(s) for s in sh), dtype=np.uint64, count=len(sh))
        # (perm, shingle) permuted hashes → min per permutation. uint64
        # wraparound in a*h+b is part of the mixing (deterministic
        # everywhere); the Mersenne mod keeps values in hash range.
        a = self.a.astype(np.uint64)
        b = self.b.astype(np.uint64)
        vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Emit one row per (doc, band): the LSH explode."""
        ids: List[object] = []
        band_ids: List[int] = []
        band_hashes: List[int] = []
        for doc_id, text in zip(df[self.id_col], df[self.text_col]):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(_crc(",".join(map(str, chunk))))
        return pd.DataFrame({self.id_col: ids,
                             "band_id": np.array(band_ids, dtype=np.int32),
                             "band_hash": np.array(band_hashes, dtype=np.int64)})


def _jaccard(a: str, b: str, shingle: int) -> float:
    ta, tb = a.split(" "), b.split(" ")
    sa = {" ".join(ta[i:i + shingle]) for i in range(max(1, len(ta) - shingle + 1))}
    sb = {" ".join(tb[i:i + shingle]) for i in range(max(1, len(tb) - shingle + 1))}
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if inter else 0.0


def minhash_lsh_pairs(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, shingle: int = 3,
                      seed: int = 42, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash+LSH with exact-Jaccard verify.

    shingle→minhash→band→bucket-groupby candidates; the candidate set is
    assumed small relative to the corpus (it is, for any sane threshold)
    and is verified driver-side against the candidate docs' texts.
    Returns (doc_a, doc_b, jaccard_pct:int32), doc_a < doc_b.
    """
    bands_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle=shingle, seed=seed,
                                   bands=bands, id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=(1, 8))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(df[id_col].unique().tolist())[:200]  # cap pathological buckets
        if len(vals) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(df[id_col].dtype)
        pa_, pb_ = [], []
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                pa_.append(vals[i])
                pb_.append(vals[j])
        return pd.DataFrame({"doc_a": pa_, "doc_b": pb_})

    cand = (bands_ds.groupby(["band_id", "band_hash"])
            .map_groups(bucket_pairs, batch_format="pandas"))
    pairs = cand.to_pandas().drop_duplicates(ignore_index=True)
    if pairs.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard_pct": pd.Series([], dtype="int32")})

    need = set(pairs["doc_a"]) | set(pairs["doc_b"])
    texts_df = semi_anti_filter(ds.select_columns([id_col, text_col]), id_col, need
                                ).to_pandas()
    texts = dict(zip(texts_df[id_col], texts_df[text_col]))
    jac = [int(round(100 * _jaccard(texts[a], texts[b], shingle)))
           for a, b in zip(pairs["doc_a"], pairs["doc_b"])]
    pairs["jaccard_pct"] = np.array(jac, dtype=np.int32)
    out = pairs[pairs["jaccard_pct"] >= int(jaccard_threshold * 100)]
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


def cluster_pairs(pairs: pd.DataFrame, a_col: str = "doc_a",
                  b_col: str = "doc_b") -> pd.DataFrame:
    """Connected components over near-dup candidate pairs →
    (doc_id, cluster_id = min reachable doc_id). Union-find on the
    driver: valid because the pair set is post-LSH/post-verify output,
    which is bounded (≈ duplicate count, not corpus size). For a pair
    set too large for one machine, iterate min-label propagation with
    groupby rounds instead (SCALE.md §dedup near-dup pattern)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs[a_col], pairs[b_col]):
        union(a, b)
    members = sorted(set(pairs[a_col]) | set(pairs[b_col]))
    return pd.DataFrame({"doc_id": members,
                         "cluster_id": [find(m) for m in members]})


def connected_components_distributed(edges: rd.Dataset, a_col: str = "doc_a",
                                     b_col: str = "doc_b",
                                     max_rounds: int = 50) -> pd.DataFrame:
    """Connected components as iterative min-label propagation: the EDGE
    set stays a distributed Dataset (that's the big side at 100 TB — it
    streams through map_batches each round); the label table is the
    small side, broadcast via ray.put and min-reduced per batch, then
    merged driver-side. Labels only decrease, so the changed-count
    convergence check is exact; rounds ≤ graph diameter.

    Sizing: the label table is one row per node that appears in a
    candidate pair — bounded by the duplicate count, not the corpus.
    Beyond ~10^8 such nodes the label side must be hash-partitioned too
    (alternate the broadcast with relops.hash_join per round).
    Returns (doc_id, cluster_id)."""
    import ray

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pd.concat([df[a_col], df[b_col]],
                                                 ignore_index=True)})

    nodes = (partial_aggregate(edges.map_batches(to_nodes, batch_format="pandas"),
                               ["doc_id"], {"n": ("count", None)})
             .to_pandas()["doc_id"])
    labels = pd.Series(nodes.to_numpy(), index=nodes.to_numpy())

    edges = edges.materialize()  # reused every round
    for _ in range(max_rounds):
        ref = ray.put(labels)

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            lab = ray.get(ref)
            la = lab.loc[df[a_col]].to_numpy()
            lb = lab.loc[df[b_col]].to_numpy()
            m = np.minimum(la, lb)
            out = pd.DataFrame({
                "doc_id": pd.concat([df[a_col], df[b_col]], ignore_index=True),
                "label": np.concatenate([m, m]),
            })
            # per-batch combiner: one row per node per batch
            return out.groupby("doc_id", sort=False, as_index=False).min()

        partial = (edges.map_batches(propagate, batch_format="pandas")
                   .to_pandas().groupby("doc_id")["label"].min())
        new_labels = labels.copy()
        common = partial.index
        improved = partial.to_numpy() < labels.loc[common].to_numpy()
        if not improved.any():
            break
        new_labels.loc[common[improved]] = partial.to_numpy()[improved]
        labels = new_labels

    return pd.DataFrame({"doc_id": labels.index.to_numpy(),
                         "cluster_id": labels.to_numpy()})


def dedup_by_minhash(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                     jaccard_threshold: float = 0.5, **kwargs) -> rd.Dataset:
    """End-to-end fuzzy dedup: MinHash+LSH candidate pairs → verified
    Jaccard → connected components → drop every non-minimum member of
    each cluster (first-wins) via a broadcast anti-join. Returns the
    deduplicated dataset (all columns)."""
    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                              jaccard_threshold=jaccard_threshold, **kwargs)
    if pairs.empty:
        return ds
    clusters = cluster_pairs(pairs)
    drop = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"])
    return semi_anti_filter(ds, id_col, drop, anti=True)


# -------------------------------------------------------------- simhash


class SimHasher:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col, self.text_col = id_col, text_col

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in text.split(" "):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += 2 * bits - 1
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= 1 << i
        return val - (1 << 64) if val >= (1 << 63) else val  # signed int64

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "simhash": np.array([self.simhash(t) for t in df[self.text_col]],
                                dtype=np.int64),
        })


def simhash_table(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    return ds.map_batches(SimHasher,
                          fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
                          batch_format="pandas", concurrency=(1, 8))


def simhash_near_pairs(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into four
    16-bit keys (any pair within hamming ≤ 3 of each other shares at
    least one band exactly — pigeonhole), bucket-groupby candidates,
    verify hamming. Returns (doc_a, doc_b, hamming:int32)."""
    sigs = simhash_table(ds, id_col=id_col, text_col=text_col)

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        h = df["simhash"].to_numpy().astype(np.uint64)
        for band in range(4):
            out.append(pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "simhash": df["simhash"].to_numpy(),
                "band_id": np.int32(band),
                "band_val": ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, ignore_index=True)
        a_, b_, ham_ = [], [], []
        n = min(len(df), 200)  # cap pathological buckets; log via lineage at scale
        for i in range(n):
            for j in range(i + 1, n):
                if df[id_col][i] == df[id_col][j]:
                    continue
                ham = bin((int(df["simhash"][i]) ^ int(df["simhash"][j]))
                          & ((1 << 64) - 1)).count("1")
                if ham <= max_hamming:
                    a_.append(df[id_col][i])
                    b_.append(df[id_col][j])
                    ham_.append(ham)
        return pd.DataFrame({"doc_a": a_, "doc_b": b_,
                             "hamming": np.array(ham_, dtype=np.int32)})

    pairs = (sigs.map_batches(explode_bands, batch_format="pandas")
             .groupby(["band_id", "band_val"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # the same pair surfaces from every band it shares: global dedup
    return partial_aggregate(pairs, ["doc_a", "doc_b"],
                             {"hamming": ("min", "hamming")})


def ngram_jaccard_pairs(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                        block_tokens: int = 2, shingle: int = 3,
                        threshold_pct: int = 50) -> rd.Dataset:
    """Blocked pairwise n-gram Jaccard: docs sharing a leading-token
    block are compared exhaustively within the block (groupby shuffle on
    the block key only; assumes blocks are small — log a dropped-pairs
    count if a block exceeds the cap rather than blowing up)."""
    CAP = 200

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].copy()
        df["block"] = [md5_hex(" ".join(t.split(" ")[:block_tokens])) for t in df[text_col]]
        return df

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, ignore_index=True)
        n = min(len(df), CAP)
        a_, b_, j_ = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                pct = int(round(100 * _jaccard(df[text_col][i], df[text_col][j], shingle)))
                if pct >= threshold_pct:
                    a_.append(df[id_col][i])
                    b_.append(df[id_col][j])
                    j_.append(pct)
        return pd.DataFrame({"doc_a": a_, "doc_b": b_,
                             "jaccard_pct": np.array(j_, dtype=np.int32)})

    return (ds.map_batches(add_block, batch_format="pandas")
            .groupby("block").map_groups(block_pairs, batch_format="pandas"))


# -------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(emb: rd.Dataset, id_col: str = "vec_id",
                             vec_col: str = "embedding", group_col: str = "label",
                             threshold: float = 0.4) -> rd.Dataset:
    """Embedding-cosine near-dup pairs within a partition key (group_col
    bounds the pairwise blow-up; at scale the group key would be an LSH
    bucket — see similarity.lsh_buckets). Returns (vec_id_a, vec_id_b)."""

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] > threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_id_a": lo.astype(np.int64),
                             "vec_id_b": hi.astype(np.int64)})

    return emb.groupby(group_col).map_groups(group_fn, batch_format="pandas")
