"""HyperLogLog sketch tests: error bound vs exact distinct, merge
associativity, determinism."""

import numpy as np
import pandas as pd
import ray.data as rd

from westa_ocr_ray.sketches import HyperLogLog, approx_distinct


def test_hll_error_bound():
    rng = np.random.RandomState(7)
    for true_n in (100, 5000, 50000):
        vals = rng.randint(0, 2**64, size=true_n * 2, dtype=np.uint64)
        uniq = np.unique(vals)  # sorted — must re-shuffle before truncating,
        uniq = uniq[rng.permutation(len(uniq))[:true_n]]  # else top bits bias low
        hll = HyperLogLog(p=12)
        hll.add_hashes(uniq)
        est = hll.estimate()
        rel_err = abs(est - true_n) / true_n
        assert rel_err < 0.05, (true_n, est)


def test_hll_merge_equals_single():
    rng = np.random.RandomState(1)
    h = rng.randint(0, 2**62, size=10000, dtype=np.int64).astype(np.uint64)
    whole = HyperLogLog(p=10)
    whole.add_hashes(h)
    a, b = HyperLogLog(p=10), HyperLogLog(p=10)
    a.add_hashes(h[:4000])
    b.add_hashes(h[4000:])
    a.merge(b)
    assert (a.registers == whole.registers).all()


def test_approx_distinct_on_dataset():
    df = pd.DataFrame({"user_id": np.arange(4000) % 1000})
    est = approx_distinct(rd.from_pandas(df), "user_id", p=12)
    assert abs(est - 1000) / 1000 < 0.05
    # deterministic
    assert est == approx_distinct(rd.from_pandas(df), "user_id", p=12)


def test_misra_gries_heavy_hitters_guarantee():
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import sketches

    # one dominant value (35%), a mid value (15%), long uniform tail
    vals = (["hot"] * 3500 + ["warm"] * 1500
            + [f"t{i % 500}" for i in range(5000)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    k = 10
    out = sketches.heavy_hitters(ds, "v", k=k)
    got = dict(zip(out["v"], out["min_count"]))
    n = len(vals)
    # every value with freq > n/k MUST be present with a lower-bound
    # count within n/k of truth
    for val, true in (("hot", 3500), ("warm", 1500)):
        assert val in got
        assert true - n / k <= got[val] <= true


def test_bloom_no_false_negatives_and_bounded_fp():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import sketches

    keys = pd.DataFrame({"k": [f"key_{i}" for i in range(2000)]})
    bloom = sketches.bloom_from_dataset(
        rd.from_pandas(keys).repartition(8), "k", m_bits=1 << 16, k=4)
    # every inserted key must hit (no false negatives, ever)
    hits = sketches.bloom_might_contain(keys["k"], bloom, 1 << 16, 4)
    assert hits.all()
    # absent keys: FP rate near the analytic (1-e^{-kn/m})^k ≈ 0.3%
    absent = pd.Series([f"other_{i}" for i in range(5000)])
    fp = sketches.bloom_might_contain(absent, bloom, 1 << 16, 4).mean()
    assert fp < 0.02


def test_count_min_never_underestimates_and_is_tight_for_heavy_keys():
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import sketches

    # zipf-ish: key_i appears (2000 // (i+1)) times
    vals = [f"key_{i}" for i in range(200) for _ in range(2000 // (i + 1))]
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    grid = sketches.count_min_build(ds, "v", width=2048, depth=4)
    n = len(vals)
    truth = pd.Series(vals).value_counts()
    q = pd.Series([f"key_{i}" for i in range(200)])
    est = sketches.count_min_query(grid, q)
    for i, e in enumerate(est):
        t = truth[f"key_{i}"]
        assert e >= t  # CMS never underestimates
        assert e <= t + 3 * n / 2048  # ~e*N/width slack, generous
    # grid mass = depth * N (each occurrence increments one cell per row)
    assert grid.sum() == 4 * n


def test_count_min_premerge_identical_to_flat():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import sketches

    vals = [f"k{i % 37}" for i in range(1500)]
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    g1 = sketches.count_min_build(ds, "v", width=256, depth=3,
                                  premerge_buckets=2)
    g2 = sketches.count_min_build(ds, "v", width=256, depth=3,
                                  premerge_buckets=64)
    assert np.array_equal(g1, g2)


def test_heavy_hitters_exact_matches_truth_any_layout():
    """heavy_hitters_exact output is the EXACT set {v: cnt(v)*k > n}
    with exact counts, independent of block layout (the MG candidate
    sweep only picks who gets counted; the exact filter decides)."""
    from westa_ocr_ray.sketches import heavy_hitters_exact

    rng = np.random.RandomState(3)
    # zipf-ish: a few heavy values on a uniform tail
    vals = np.concatenate([
        np.repeat(["hh_a", "hh_b", "hh_c"], [900, 700, 500]),
        np.array([f"t{i}" for i in rng.randint(0, 2000, size=3000)]),
    ])
    rng.shuffle(vals)
    df = pd.DataFrame({"token": vals})
    n = len(df)
    truth = df["token"].value_counts()
    k = 20
    expect = {t: int(c) for t, c in truth.items() if c * k > n}

    outs = []
    for parts in (1, 7, 32):
        out = heavy_hitters_exact(rd.from_pandas(df).repartition(parts),
                                  "token", k=k)
        got = dict(zip(out["token"], out["cnt"].astype(int)))
        assert got == expect, (parts, got, expect)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_heavy_hitters_exact_integer_column():
    """The round-3 advisory case: MG candidates are JSON STRING keys,
    so pass 2 must compare on the stringified column — an int column
    used to silently match nothing and return empty."""
    from westa_ocr_ray.sketches import heavy_hitters_exact

    vals = np.concatenate([np.repeat([7, 42], [800, 600]),
                           np.arange(1000, 3500)]).astype(np.int64)
    df = pd.DataFrame({"uid": vals})
    k = 5
    out = heavy_hitters_exact(rd.from_pandas(df).repartition(6), "uid", k=k)
    got = dict(zip(out["uid"].astype(int), out["cnt"].astype(int)))
    truth = df["uid"].value_counts()
    expect = {int(v): int(c) for v, c in truth.items() if c * k > len(df)}
    assert got == expect and expect  # non-empty: 7 and 42 are heavy


def test_heavy_hitters_exact_empty_when_uniform():
    from westa_ocr_ray.sketches import heavy_hitters_exact

    df = pd.DataFrame({"token": [f"u{i}" for i in range(5000)]})
    out = heavy_hitters_exact(rd.from_pandas(df).repartition(8), "token",
                              k=50)
    assert len(out) == 0


def test_hll_register_table_matches_serial_md5():
    """Distributed md5-parity registers == a serial single-process
    build, under any partitioning (register max is order-free)."""
    import hashlib

    from westa_ocr_ray.sketches import _md5_hll_parts, hll_register_table

    p = 12
    df = pd.DataFrame({"user_id": np.arange(3000) % 777})
    idx, rho = _md5_hll_parts(df["user_id"].astype(str).to_numpy(), p)
    serial = np.zeros(1 << p, dtype=np.int32)
    np.maximum.at(serial, idx, rho)

    for parts in (1, 16):
        out = hll_register_table(rd.from_pandas(df).repartition(parts),
                                 "user_id", p=p)
        assert (out["register"].to_numpy() == serial).all()
        assert (out["idx"].to_numpy() == np.arange(1 << p)).all()

    # the md5 hash definition itself: first 8 digest bytes, big-endian
    h = int.from_bytes(hashlib.md5(b"42").digest()[:8], "big")
    i1, r1 = _md5_hll_parts(np.array(["42"], dtype=object), p)
    assert i1[0] == h >> 52
    tail = h & ((1 << 52) - 1)
    assert r1[0] == (53 if tail == 0 else 53 - tail.bit_length())
