"""Round-3 same-window A/Bs (one mode per fresh process; interleave
modes from the shell so host-steal windows hit all variants equally):

  python scripts/ab_r3.py <mode> [sf_dir]

modes:
  lm_fused    - lm_unigram_score as shipped (scoring fused into the join)
  lm_unfused  - the round-2 shape: join, then a separate score pass +
                per-(doc,token) rows into the final aggregate
  o1          - o1_first_line_partkey (VERDICT r2 #8: moved 2.5x between
                driver rounds on unchanged code; re-read in one window)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def lm_unfused(sf_dir):
    """Round-2 lm_unigram_score (queries.py @ 2f37bc4): separate score
    map over the join output + full-width rows into the aggregate."""
    import ray.data as rd  # noqa: F401

    from westa_ocr_ray.queries import rp
    from westa_ocr_ray.relops import hash_join, partial_aggregate

    docs = rp(sf_dir, "documents", ["doc_id", "text"])

    def doc_tf(df):
        from collections import Counter

        ids, toks, tfs = [], [], []
        for did, text in zip(df["doc_id"], df["text"]):
            c = Counter(t for t in text.split(" ") if t)
            ids.extend([did] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pd.DataFrame({"doc_id": ids, "token": toks,
                             "tf": np.array(tfs, dtype=np.int64)})

    tf = docs.map_batches(doc_tf, batch_format="pandas")
    counts = partial_aggregate(tf, ["token"], {"cnt": ("sum", "tf")}).materialize()
    total = int(counts.map_batches(
        lambda df: pd.DataFrame({"t": [int(df["cnt"].sum())]}),
        batch_format="pandas").to_pandas()["t"].sum())
    joined = hash_join(tf, counts, "token", "token",
                       left_cols=["doc_id", "token", "tf"],
                       right_cols=["token", "cnt"])

    def score(df):
        cnt = df["cnt"].to_numpy(dtype=np.float64)
        surprisal = np.round(1000.0 * np.log(total / cnt)).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "part_mn": df["tf"].to_numpy(dtype=np.int64)
                             * surprisal}).infer_objects()

    return partial_aggregate(joined.map_batches(score, batch_format="pandas"),
                             ["doc_id"], {"surprisal_mn": ("sum", "part_mn")})


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import bench
    bench._warm_workers(ncpu)

    from westa_ocr_ray import queries

    t0 = time.perf_counter()
    if mode == "lm_fused":
        n = queries.lm_unigram_score(sf_dir).count()
    elif mode == "lm_unfused":
        n = lm_unfused(sf_dir).count()
    elif mode == "o1":
        n = queries.o1_first_line_partkey(sf_dir).count()
    else:
        raise SystemExit(f"unknown mode {mode}")
    wall = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "sec": round(wall, 3), "rows": n,
                      "sf": sf_dir, "num_cpus": ncpu}))
    ray.shutdown()


if __name__ == "__main__":
    main()
