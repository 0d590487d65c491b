"""Distributed graph analytics over derived document graphs.

PageRank here is ALL-INTEGER (milli-unit ranks, floor-division
contributions), which buys two things at once: floating sums over an
unordered edge list would be block-layout-dependent, and integer
arithmetic lets a SQL oracle replay every iteration bit-for-bit
(queries.ORACLE_SQL['pagerank_dups']). The public power-iteration
method; damping 0.85 expressed as integer 85/100 ops."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import ray.data as rd

from .relops import hash_join, partial_aggregate


def pagerank_int(edges: rd.Dataset, n_iter: int = 3,
                 src_col: str = "src", dst_col: str = "dst",
                 num_buckets: Optional[int] = None) -> rd.Dataset:
    """Integer-milli PageRank over an UNDIRECTED edge list (pass each
    pair once; it is symmetrized here). Per iteration: every node
    sends rank_mu // degree along each edge (one partitioned hash
    join of the rank table onto the edge list, with the per-dst
    reduce fused into the join buckets), then
    rank'_mu = 150 + (85 · Σ contributions) // 100.

    Everything that moves is (node, int) rows — the edge list is
    joined, never broadcast; ranks live in a Dataset between rounds
    (checkpointed per iteration: each round's join consumes the rank
    table once per side, and lazy re-execution would replay all prior
    rounds). Isolated nodes are out of scope (no edges = no rank
    flow). Returns (node, rank_mu)."""

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([df[src_col].to_numpy(),
                                   df[dst_col].to_numpy()]),
            "dst": np.concatenate([df[dst_col].to_numpy(),
                                   df[src_col].to_numpy()])})

    # symmetrized edges feed BOTH the degree aggregate and the edge
    # join; materialize once so the upstream pair derivation runs once
    e = edges.map_batches(sym, batch_format="pandas").materialize()
    deg = partial_aggregate(e, ["src"], {"deg": ("count", None)},
                            num_buckets=num_buckets).materialize()
    # (src, dst, deg(src)) — static across iterations, materialize once
    ed = hash_join(e, deg, "src", "src",
                   left_cols=["src", "dst"], right_cols=["src", "deg"],
                   num_buckets=num_buckets).materialize()

    ranks = deg.map_batches(
        lambda df: pd.DataFrame({"node": df["src"].to_numpy(),
                                 "rank_mu": np.full(len(df), 1000,
                                                    dtype=np.int64)}),
        batch_format="pandas").materialize()

    for _ in range(n_iter):
        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            c = (df["rank_mu"].to_numpy(np.int64)
                 // df["deg"].to_numpy(np.int64))
            out = pd.DataFrame({"node": df["dst"].to_numpy(), "s": c})
            return (out.groupby("node", sort=False, as_index=False)
                    .agg(s=("s", "sum")).infer_objects())

        j = hash_join(ed, ranks, "src", "node",
                      left_cols=["src", "dst", "deg"],
                      right_cols=["node", "rank_mu"],
                      num_buckets=num_buckets, bucket_fn=contrib)
        s = partial_aggregate(j, ["node"], {"s": ("sum", "s")},
                              num_buckets=num_buckets)
        ranks = s.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"].to_numpy(),
                 "rank_mu": 150 + (85 * df["s"].to_numpy(np.int64)) // 100}),
            batch_format="pandas").materialize()
    return ranks
