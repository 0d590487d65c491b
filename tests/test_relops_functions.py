"""relops (joins / partial aggregation) vs pandas oracles, and the
scalar function library."""

import pandas as pd
import pytest
import ray.data as rd

from westa_ocr_ray import relops
from westa_ocr_ray.functions import (build_masters_csv, csv_quote,
                                     extract_drive_id, mask_token, preview,
                                     regex_extract_first, substitute_template)


def test_partial_aggregate_matches_pandas():
    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b", "a"],
                       "v": [1, 2, 3, 4, 5, 6]})
    got = (relops.partial_aggregate(rd.from_pandas(df), ["k"],
                                    {"s": ("sum", "v"), "n": ("count", None),
                                     "mn": ("min", "v"), "mx": ("max", "v")})
           .to_pandas().sort_values("k", ignore_index=True))
    exp = (df.groupby("k", as_index=False)
             .agg(s=("v", "sum"), n=("v", "size"), mn=("v", "min"), mx=("v", "max"))
             .sort_values("k", ignore_index=True))
    pd.testing.assert_frame_equal(got[["k", "s", "n", "mn", "mx"]], exp,
                                  check_dtype=False)


def test_hash_join_matches_pandas_merge():
    left = pd.DataFrame({"id": [1, 2, 3, 4], "x": list("abcd")})
    right = pd.DataFrame({"rid": [2, 3, 3, 5], "y": [20, 30, 31, 50]})
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "id", "rid", num_buckets=4)
           .to_pandas().sort_values(["id", "y"], ignore_index=True))
    exp = (left.merge(right.rename(columns={"rid": "id"}), on="id")
               .sort_values(["id", "y"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hash_join_string_keys():
    left = pd.DataFrame({"tok": ["apple", "pear", "plum", "fig"],
                         "x": [1, 2, 3, 4]})
    right = pd.DataFrame({"t": ["pear", "fig", "fig", "kiwi"],
                          "y": [20, 40, 41, 90]})
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "tok", "t", num_buckets=4)
           .to_pandas().sort_values(["tok", "y"], ignore_index=True))
    exp = (left.merge(right.rename(columns={"t": "tok"}), on="tok")
               .sort_values(["tok", "y"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hash_join_left_keeps_unmatched():
    left = pd.DataFrame({"id": [1, 2], "x": ["a", "b"]})
    right = pd.DataFrame({"rid": [2], "y": [9]})
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "id", "rid", how="left")
           .to_pandas().sort_values("id", ignore_index=True))
    assert len(got) == 2
    assert pd.isna(got.loc[got["id"] == 1, "y"]).all()


def test_broadcast_join_and_semi_anti():
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]}))
    small = pd.DataFrame({"k": [2, 4], "name": ["two", "four"]})
    j = relops.broadcast_join(big, small, on="k").to_pandas()
    assert sorted(j["name"]) == ["four", "two"]
    semi = relops.semi_anti_filter(big, "k", {1, 3}).to_pandas()
    assert sorted(semi["k"]) == [1, 3]
    anti = relops.semi_anti_filter(big, "k", {1, 3}, anti=True).to_pandas()
    assert sorted(anti["k"]) == [2, 4]


# ----------------------------- scalar functions (SURVEY.md §2.8) -------

def test_regex_extract_first():
    assert regex_extract_first("abc 123", r"(\d+)") == "123"
    assert regex_extract_first("abc", r"(\d+)") == ""
    assert regex_extract_first("  x  ", r"x") == "x"


def test_extract_drive_id():
    url = "https://example.com/file/d/ABCDEFGHIJKLMNOPQRSTUVWXY12/view"
    assert extract_drive_id(url) == "ABCDEFGHIJKLMNOPQRSTUVWXY12"
    with pytest.raises(ValueError):
        extract_drive_id("https://example.com/short")


def test_mask_token():
    assert mask_token(None) == ""
    assert mask_token("short") == "*****"
    assert mask_token("abcdefghijklmnop") == "abcd…mnop"


def test_preview_and_template():
    assert preview("a\nb\nc", limit=3) == "a b"
    assert substitute_template("day={current_date}!", {"current_date": "2026-08-17"}) \
        == "day=2026-08-17!"


def test_csv_quote_and_masters_csv():
    assert csv_quote("plain") == "plain"
    assert csv_quote('a,"b"') == '"a,""b"""'
    rows = [{"key": "k1", "pattern": "A", "value": "v,1"},
            {"key": "k2", "pattern": "B", "value": "v2"}]
    csv = build_masters_csv(rows, "A")
    assert csv == 'key,value\nk1,"v,1"'


def test_hash_join_salted_hot_key():
    import numpy as np

    # 90% of left rows share one hot key
    left = pd.DataFrame({"k": [7] * 180 + list(range(20)),
                         "x": np.arange(200)})
    right = pd.DataFrame({"rk": [7, 7, 3, 12], "y": [70, 71, 30, 120]})
    exp = (left.merge(right.rename(columns={"rk": "k"}), on="k")
               .sort_values(["k", "x", "y"], ignore_index=True))
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "rk", num_buckets=16,
                            hot_keys={7}, salt=4)
           .to_pandas().sort_values(["k", "x", "y"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # left join keeps unmatched-left rows exactly once
    gotl = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                             "k", "rk", num_buckets=16, how="left",
                             hot_keys={7}, salt=4)
            .to_pandas())
    expl = left.merge(right.rename(columns={"rk": "k"}), on="k", how="left")
    assert len(gotl) == len(expl)


def test_hash_join_auto_salt_planted_hot_key():
    """auto_salt detects a planted 50%-hot key via the fused MG+CMS
    sketch pass, spreads its rows over `salt` buckets (bounded
    per-bucket load), and the join output is unchanged vs the unsalted
    oracle."""
    import numpy as np

    from westa_ocr_ray.sketches import detect_hot_keys

    rng = np.random.RandomState(11)
    n = 4000
    ks = np.where(rng.rand(n) < 0.5, 7, rng.randint(100, 2000, size=n))
    left = pd.DataFrame({"k": ks.astype(np.int64), "x": np.arange(n)})
    right = pd.DataFrame({"rk": np.arange(0, 2000, dtype=np.int64),
                          "y": np.arange(0, 2000) * 10})

    num_buckets = 16
    hot = detect_hot_keys(rd.from_pandas(left).repartition(8), "k",
                          num_buckets)
    assert "7" in hot  # the planted hot key is found
    # nothing in the uniform tail is anywhere near factor*n/num_buckets
    assert len(hot) == 1

    # per-bucket load bound: replicate the join's bucket arithmetic —
    # hot rows take base+{0..salt-1}, so the hot key's ~2000 rows land
    # on `salt` distinct buckets instead of one
    salt = 8
    base = pd.util.hash_pandas_object(left["k"].astype(str),
                                      index=False).to_numpy()
    offs = np.where(left["k"].astype(str).isin(hot),
                    np.arange(n, dtype=np.uint64) % np.uint64(salt),
                    np.uint64(0))
    loads = pd.Series((base + offs) % num_buckets).value_counts()
    hot_total = int((left["k"] == 7).sum())
    assert loads.max() < hot_total * 0.6  # was ~hot_total in one bucket

    exp = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "rk", num_buckets=num_buckets)
           .to_pandas().sort_values(["k", "x"], ignore_index=True))
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "rk", num_buckets=num_buckets,
                            auto_salt=True, salt=salt)
           .to_pandas().sort_values(["k", "x"], ignore_index=True))
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_global_value_rank_exact_and_layout_independent():
    """global_value_rank == row_number() OVER (ORDER BY v DESC, id) on
    any block layout, including heavy ties and a degenerate all-equal
    column (everything lands in one bin — unbalanced but correct)."""
    import numpy as np

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 40, size=1000)  # heavy ties
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "v": vals.astype(np.int64)})
    exp = df.sort_values(["v", "id"], ascending=[False, True],
                         ignore_index=True)
    exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)

    for parts in (1, 7):
        got = (relops.global_value_rank(
            rd.from_pandas(df).repartition(parts), "v", "id",
            num_bins=16)
            .to_pandas().sort_values("rank", ignore_index=True))
        pd.testing.assert_frame_equal(
            got[["id", "v", "rank"]], exp[["id", "v", "rank"]],
            check_dtype=False)

    # ascending + degenerate single-value column
    one = pd.DataFrame({"id": np.arange(50, dtype=np.int64),
                        "v": np.full(50, 9, dtype=np.int64)})
    got = (relops.global_value_rank(rd.from_pandas(one).repartition(4),
                                    "v", "id", descending=False)
           .to_pandas().sort_values("rank", ignore_index=True))
    assert list(got["id"]) == list(range(50))
    assert list(got["rank"]) == list(range(1, 51))


def test_hash_join_salt_clamped_to_num_buckets():
    import numpy as np

    # salt > num_buckets used to wrap hot-key replicas onto already-used
    # buckets, making hot pairs meet (and emit) more than once
    left = pd.DataFrame({"k": [7] * 50 + [1, 2, 3], "x": np.arange(53)})
    right = pd.DataFrame({"rk": [7, 1], "y": [70, 10]})
    exp = (left.merge(right.rename(columns={"rk": "k"}), on="k")
               .sort_values(["k", "x", "y"], ignore_index=True))
    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "rk", num_buckets=4,
                            hot_keys={7}, salt=16)
           .to_pandas().sort_values(["k", "x", "y"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hash_join_bucket_fn_fusion():
    # bucket_fn aggregates inside the join task; result must equal the
    # unfused join + groupby
    left = pd.DataFrame({"id": [1, 1, 2, 2, 3], "v": [1, 2, 3, 4, 5]})
    right = pd.DataFrame({"rid": [1, 2, 3], "w": [10, 20, 30]})

    def agg(df):
        df = df.assign(p=df["v"] * df["w"])
        return df.groupby("id", as_index=False).agg(p=("p", "sum"))

    got = (relops.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            "id", "rid", num_buckets=4, bucket_fn=agg)
           .to_pandas().sort_values("id", ignore_index=True))
    exp = agg(left.merge(right.rename(columns={"rid": "id"}), on="id")) \
        .sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_auto_buckets_sizing_rule():
    import ray

    # floor preserved on tiny inputs
    assert relops.auto_buckets(floor=64, size_bytes=1) >= 64
    # grows with data size: one bucket per TARGET_BUCKET_BYTES
    big = relops.auto_buckets(floor=64,
                              size_bytes=1000 * relops.TARGET_BUCKET_BYTES)
    assert big >= 1000
    # grows with cluster CPUs (test session: 4 CPUs → floor dominates,
    # but the term must be present and non-zero)
    assert relops.auto_buckets(floor=1) >= 4 * int(
        ray.cluster_resources().get("CPU", 1))
    # operators accept the default (None) and still compute correctly
    df = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    got = (relops.partial_aggregate(rd.from_pandas(df), ["k"],
                                    {"s": ("sum", "v")})
           .to_pandas().sort_values("k", ignore_index=True))
    assert list(got["s"]) == [4, 2]


def test_input_size_bytes():
    import os

    p = "/root/testdata/sf0.001/lineitem.parquet"
    if os.path.exists(p):
        assert relops.input_size_bytes(p) == os.path.getsize(p)
    assert relops.input_size_bytes("/nonexistent/path") == 0


def test_semi_anti_filter_scalable_matches_broadcast():
    import numpy as np

    big = rd.from_pandas(pd.DataFrame({"k": list(range(200)),
                                       "v": np.arange(200) * 10}))
    keys = rd.from_pandas(pd.DataFrame(
        {"kk": [3, 7, 7, 42, 99, 150]}))  # dup key: must not multiply rows
    key_set = {3, 7, 42, 99, 150}

    for anti in (False, True):
        exp = (relops.semi_anti_filter(big, "k", key_set, anti=anti)
               .to_pandas().sort_values("k", ignore_index=True))
        # tiny filter (m_bits=256) forces MANY false positives: the
        # exact-resolution join must still produce bit-exact output
        got = (relops.semi_anti_filter_scalable(big, "k", keys,
                                                key_col="kk", anti=anti,
                                                m_bits=256, num_buckets=4)
               .to_pandas().sort_values("k", ignore_index=True))
        pd.testing.assert_frame_equal(got[["k", "v"]].astype("int64"),
                                      exp[["k", "v"]].astype("int64"))


def test_grouped_topk_matches_pandas():
    import numpy as np
    from westa_ocr_ray.relops import grouped_topk
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"g": rng.randint(0, 5, 400),      # skewed small groups
                       "v": rng.randint(0, 50, 400),
                       "uid": np.arange(400)})
    df.loc[df.index[:200], "g"] = 0                      # hot group
    out = (grouped_topk(rd.from_pandas(df).repartition(6), ["g"],
                        ["v", "uid"], k=3, ascending=[False, True],
                        num_buckets=4)
           .to_pandas().sort_values(["g", "rk"], ignore_index=True))
    exp = (df.sort_values(["g", "v", "uid"], ascending=[True, False, True])
             .groupby("g").head(3)
             .sort_values(["g", "v", "uid"], ascending=[True, False, True],
                          ignore_index=True))
    exp["rk"] = exp.groupby("g").cumcount() + 1
    assert out[["g", "v", "uid", "rk"]].values.tolist() == \
        exp[["g", "v", "uid", "rk"]].values.tolist()


def test_grouped_topk_k_exceeds_group_size():
    from westa_ocr_ray.relops import grouped_topk
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 9],
                       "uid": [1, 2, 3]})
    out = grouped_topk(rd.from_pandas(df), ["g"], ["v", "uid"], k=5,
                       ascending=[False, True], num_buckets=2).to_pandas()
    assert len(out) == 3 and set(out["rk"]) <= {1, 2}


def test_compact_blocks_collapses_fragmentation():
    from westa_ocr_ray.relops import compact_blocks
    frag = rd.from_pandas(pd.DataFrame({"x": range(500)})).repartition(200)
    frag = frag.materialize()
    assert frag.num_blocks() == 200
    out = compact_blocks(frag)
    assert out.num_blocks() < 200
    assert sorted(r["x"] for r in out.take_all()) == list(range(500))


def test_exact_order_statistic_matches_sort():
    import numpy as np
    rng = np.random.default_rng(3)
    vals = rng.integers(-500, 5000, size=4000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    s = np.sort(vals)
    for k in (1, 7, 2000, 3999, 4000):
        assert relops.exact_order_statistic(ds, "v", k, bin_width=64) == s[k - 1]
    with pytest.raises(ValueError):
        relops.exact_order_statistic(ds, "v", 0)
    with pytest.raises(ValueError):
        relops.exact_order_statistic(ds, "v", 4001)


def test_pagerank_int_matches_serial_iteration():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import graph

    # two triangles bridged by one edge (undirected, pass each once)
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    edges = pd.DataFrame(pairs, columns=["src", "dst"])
    got = (graph.pagerank_int(rd.from_pandas(edges), n_iter=3,
                              num_buckets=4)
           .to_pandas().sort_values("node", ignore_index=True))

    # independent serial integer iteration
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    rank = {v: 1000 for v in adj}
    for _ in range(3):
        s = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            c = rank[u] // len(nbrs)
            for v in nbrs:
                s[v] += c
        rank = {v: 150 + (85 * sv) // 100 for v, sv in s.items()}
    exp = pd.DataFrame(sorted(rank.items()), columns=["node", "rank_mu"])
    assert list(got["node"]) == list(exp["node"])
    assert list(got["rank_mu"]) == list(exp["rank_mu"])
    # bridge endpoints (3, 4) carry the most rank
    top2 = set(got.nlargest(2, "rank_mu")["node"])
    assert top2 == {3, 4}


def test_grouped_quantile_thresholds_match_sort():
    """Grouped two-pass order statistic == per-group sorted-rank value,
    for several quantiles, bin widths and block layouts."""
    import numpy as np

    from westa_ocr_ray.relops import (grouped_percentile_filter,
                                      grouped_quantile_thresholds)

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "fr", "de"], size=2000,
                           p=[0.7, 0.2, 0.1]),  # skewed group sizes
        "v": rng.randint(0, 5000, size=2000).astype(np.int64),
    })

    for q_num, q_den in ((1, 4), (1, 2), (9, 10)):
        for bw in (1, 64, 1000):
            ds = rd.from_pandas(df).repartition(7)
            thr = grouped_quantile_thresholds(ds, "lang", "v", q_num,
                                              q_den, bin_width=bw)
            for g, sub in df.groupby("lang"):
                k = (len(sub) * q_num + q_den - 1) // q_den
                exp = int(np.sort(sub["v"].to_numpy())[k - 1])
                assert thr[g] == exp, (q_num, q_den, bw, g)

    kept = (grouped_percentile_filter(rd.from_pandas(df).repartition(5),
                                      "lang", "v", 1, 4).to_pandas())
    for g, sub in df.groupby("lang"):
        k = (len(sub) + 3) // 4
        t = int(np.sort(sub["v"].to_numpy())[k - 1])
        exp_ids = set(sub[sub["v"] >= t].index)
        assert len(kept[kept["lang"] == g]) == len(exp_ids)


def test_events_late_flags_invariants():
    """In-order users carry all zeros; a planted out-of-order arrival
    gets the exact disorder distance and the watermark flag."""
    base = 1_700_000_000_000_000  # µs epoch
    rows = [
        # user 1: strictly in order
        {"event_id": 1, "user_id": 1, "ts": base + 0},
        {"event_id": 2, "user_id": 1, "ts": base + 10**6},
        # user 2: event 12 arrives 3 minutes behind the frontier
        {"event_id": 11, "user_id": 2, "ts": base + 300 * 10**6},
        {"event_id": 12, "user_id": 2, "ts": base + 120 * 10**6},
        # user 2: event 13 only 1s behind -> disordered but NOT late
        {"event_id": 13, "user_id": 2, "ts": base + 299 * 10**6},
    ]
    df = pd.DataFrame(rows)
    # the events table schema is timestamp[us] (TESTDATA.md); the
    # ordered-log ops derive integer MICROseconds from it
    df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")

    import westa_ocr_ray.queries as q
    # drive through the real query against a temp parquet dir
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(os.path.join(td, "events.parquet"))
        got = (q.events_late_flags(td).to_pandas()
               .set_index("event_id").sort_index())
    assert list(got.loc[[1, 2], "disorder_us"]) == [0, 0]
    assert int(got.loc[12, "disorder_us"]) == 180 * 10**6
    assert int(got.loc[12, "is_late"]) == 1
    assert int(got.loc[13, "disorder_us"]) == 1 * 10**6
    assert int(got.loc[13, "is_late"]) == 0


def test_ntile_from_rank_matches_duckdb():
    """relops.ntile_from_rank reproduces ANSI NTILE for ragged n
    (n % tiles != 0), tiny n < tiles, and the uniform case."""
    import duckdb
    import numpy as np

    for n, tiles in ((13, 5), (500, 10), (3, 7), (1, 4), (29, 4)):
        ranks = np.arange(1, n + 1, dtype=np.int64)
        exp = duckdb.sql(
            f"SELECT ntile({tiles}) OVER (ORDER BY r) AS t "
            f"FROM range(1, {n + 1}) AS x(r) ORDER BY r"
        ).df()["t"].to_numpy()
        got = relops.ntile_from_rank(ranks, n, tiles)
        assert np.array_equal(got, exp), (n, tiles)


def test_grouped_kth_from_top_matches_rank_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import relops

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=300),
        "v": rng.integers(0, 40, size=300).astype("int64"),  # many ties
    })
    # a tiny group with fewer rows than k
    df = pd.concat([df, pd.DataFrame({"g": ["tiny"] * 2,
                                      "v": [7, 9]})], ignore_index=True)
    k = 10
    thr = relops.grouped_kth_from_top(
        rd.from_pandas(df).repartition(7), "g", "v", k)
    got = df[df["v"] >= df["g"].map(thr)]
    df2 = df.copy()
    df2["rk"] = df2.groupby("g")["v"].rank(method="min", ascending=False)
    want = df2[df2["rk"] <= k]
    assert sorted(map(tuple, got[["g", "v"]].to_numpy())) == \
        sorted(map(tuple, want[["g", "v"]].to_numpy()))
    assert thr["tiny"] == 7  # < k rows -> group minimum (keep all)


def test_exact_median_matches_order_statistic(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import relops

    rng = np.random.default_rng(9)
    for size in (1, 2, 7, 500):
        v = rng.integers(-1000, 1000, size=size).astype("int64")
        ds = rd.from_pandas(pd.DataFrame({"v": v})).repartition(3)
        med, n = relops.exact_median(ds, "v")
        assert n == size
        assert med == int(np.sort(v)[(size + 1) // 2 - 1])
    import pytest as _pt
    with _pt.raises(ValueError):
        relops.exact_median(
            rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")})),
            "v")


def test_skyline_block_matches_bruteforce():
    import numpy as np
    import pandas as pd

    from westa_ocr_ray.queries import _skyline_block

    rng = np.random.default_rng(31)
    for trial in range(50):
        n = int(rng.integers(1, 60))
        df = pd.DataFrame({
            "doc_id": np.arange(n),
            "nt": rng.integers(0, 12, size=n).astype("int64"),
            "nd": rng.integers(0, 12, size=n).astype("int64")})
        got = set(map(tuple,
                      _skyline_block(df)[["doc_id", "nt", "nd"]]
                      .to_numpy()))
        want = set()
        pts = df.to_numpy()
        for i in range(n):
            dominated = any(
                pts[j][1] >= pts[i][1] and pts[j][2] >= pts[i][2]
                and (pts[j][1] > pts[i][1] or pts[j][2] > pts[i][2])
                for j in range(n))
            if not dominated:
                want.add(tuple(pts[i]))
        assert got == want, trial


def test_skyline_merge_layout_independent(ray_session):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the
    distributed merge relies on this; check the full query shape is
    block-layout independent."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray.queries import _skyline_block

    rng = np.random.default_rng(33)
    df = pd.DataFrame({
        "doc_id": np.arange(200),
        "nt": rng.integers(0, 30, size=200).astype("int64"),
        "nd": rng.integers(0, 30, size=200).astype("int64")})

    def run(nblocks):
        local = (rd.from_pandas(df).repartition(nblocks)
                 .map_batches(_skyline_block, batch_format="pandas"))
        merged = local.map_batches(
            lambda d: d.assign(__g=np.zeros(len(d), dtype=np.int32)),
            batch_format="pandas").groupby("__g").map_groups(
            lambda d: _skyline_block(d.drop(columns="__g")),
            batch_format="pandas").to_pandas()
        return set(map(tuple, merged[["doc_id", "nt", "nd"]].to_numpy()))

    assert run(1) == run(7) == run(31)
