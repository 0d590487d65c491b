"""Similarity-search tests: brute-force exactness vs a numpy oracle and
ANN recall vs brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

from westa_ocr_ray import similarity

SF = "/root/testdata/sf0.001"


def _emb():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _numpy_oracle(k=5, qids=(0, 1, 2, 3)):
    df = _emb().to_pandas().sort_values("vec_id", ignore_index=True)
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    out = {}
    for q in qids:
        qi = np.flatnonzero(ids == q)[0]
        sims = m @ m[qi]
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        out[q] = [int(ids[i]) for i in order if ids[i] != q][:k]
    return out


def test_brute_force_topk_matches_numpy_oracle():
    got = similarity.brute_force_topk(_emb(), query_ids=[0, 1, 2, 3], k=5)
    exp = _numpy_oracle()
    for q, neighbors in exp.items():
        sub = got[got["query_id"] == q].sort_values("rank")
        assert list(sub["neighbor_id"]) == neighbors


def test_ann_lsh_recall_vs_brute_force():
    qids = list(range(8))
    brute = similarity.brute_force_topk(_emb(), qids, k=5)
    ann = similarity.ann_topk_lsh(_emb(), qids, k=5, n_planes=4)
    hits = total = 0
    for q in qids:
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        a = set(ann[ann["query_id"] == q]["neighbor_id"])
        hits += len(b & a)
        total += len(b)
    recall = hits / total
    # 4 hyperplanes → 16 buckets over 500 vectors; probing the union of
    # the queries' buckets should recover a sizeable share of true top-k
    assert recall >= 0.3, recall


def test_lsh_buckets_deterministic():
    b1 = similarity.lsh_buckets(_emb()).to_pandas().sort_values("vec_id",
                                                                ignore_index=True)
    b2 = similarity.lsh_buckets(_emb()).to_pandas().sort_values("vec_id",
                                                                ignore_index=True)
    pd.testing.assert_frame_equal(b1, b2)
    assert b1["bucket"].nunique() > 1


def test_ann_ivf_recall_vs_brute_force():
    qids = list(range(8))
    brute = similarity.brute_force_topk(_emb(), qids, k=5)
    ivf = similarity.ann_topk_ivf(_emb(), qids, k=5,
                                  n_centroids=8, n_probe=3, rounds=2)
    hits = total = 0
    for q in qids:
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        hits += len(b & a)
        total += len(b)
    assert hits / total >= 0.5, hits / total


def test_ivf_centroids_deterministic():
    c1 = similarity.ivf_train_centroids(_emb(), n_centroids=4, rounds=2)
    c2 = similarity.ivf_train_centroids(_emb(), n_centroids=4, rounds=2)
    assert np.array_equal(c1, c2)
    assert c1.shape[0] == 4
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_hash_embed_feeds_brute_force_topk():
    """The documents→vector bridge: hash_embed output plugs directly
    into the similarity operators (id_col/vec_col remap only)."""
    import numpy as np

    from westa_ocr_ray import text_analysis
    rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["alpha beta gamma", "alpha beta gamma delta",
                 "omega psi chi", "unrelated words entirely"]})
    emb = text_analysis.hash_embed(rd.from_pandas(rows), dim=32)
    got = similarity.brute_force_topk(emb, query_ids=[0], k=1,
                                      id_col="doc_id", vec_col="vec")
    # doc 1 shares 3 of its 4 hashed buckets with doc 0 -> nearest
    assert list(map(tuple, got.to_numpy())) == [(0, 1, 1)]


def test_contrastive_pairs_planted():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import similarity

    rng = np.random.RandomState(3)
    base = rng.standard_normal((3, 16))
    rows = []
    # anchor 0 (label 0); 1 = near-identical same-label (the positive);
    # 2 = same-label but farther; 3 = near-identical DIFFERENT label
    # (the hardest negative); 4, 5 = far different-label
    specs = [(0, 0, base[0]),
             (1, 0, base[0] + 0.01 * rng.standard_normal(16)),
             (2, 0, base[1]),
             (3, 1, base[0] + 0.01 * rng.standard_normal(16)),
             (4, 1, base[2]),
             (5, 2, -base[0])]
    for vid, lab, v in specs:
        rows.append({"vec_id": vid, "label": lab, "embedding": v.tolist()})
    out = similarity.contrastive_pairs(
        rd.from_pandas(pd.DataFrame(rows)), anchor_ids=[0], k_neg=2)
    got = {(r["role"], int(r["rk"])): int(r["cand_id"])
           for _, r in out.iterrows()}
    assert got == {("pos", 1): 1, ("neg", 1): 3, ("neg", 2): 4}


def test_ivf_index_build_query_and_resume(tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import similarity

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        c = i % 4
        rows.append({"vec_id": i, "embedding":
                     (centers[c] + 0.3 * rng.standard_normal(16)).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = str(tmp_path / "ivf")
    similarity.build_ivf_index(ds, out, n_centroids=4, rounds=2)
    assert os.path.exists(f"{out}/_SUCCESS")
    assert os.path.exists(f"{out}/centroids.parquet")

    qids = [0, 1, 2, 3]
    qvecs = np.stack([rows[q]["embedding"] for q in qids])
    got = similarity.ann_topk_from_index(out, qvecs, qids, k=5, n_probe=2)
    exact = similarity.brute_force_topk(ds, qids, k=5)
    g = {(r["query_id"], r["neighbor_id"]) for _, r in got.iterrows()}
    e = {(r["query_id"], r["neighbor_id"]) for _, r in exact.iterrows()}
    assert len(g & e) / len(e) >= 0.8  # recall vs brute force

    # resume: marker short-circuits a rebuild even with new data
    mt = os.path.getmtime(f"{out}/centroids.parquet")
    similarity.build_ivf_index(ds, out, n_centroids=4, rounds=2)
    assert os.path.getmtime(f"{out}/centroids.parquet") == mt


def test_ivf_index_incremental_add_equals_rebuild(tmp_path):
    """add_to_ivf_index (fixed centroids, new committed generation)
    must answer queries identically to a full rebuild over the union
    corpus at the SAME centroids; a crashed add's uncommitted gen
    subtree is invisible and wiped by the re-run."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray import similarity

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((4, 16)) * 3
    rows = [{"vec_id": i,
             "embedding": (centers[i % 4]
                           + 0.3 * rng.standard_normal(16)).tolist()}
            for i in range(240)]
    base = [r for r in rows if r["vec_id"] % 3 != 0]
    inc = [r for r in rows if r["vec_id"] % 3 == 0]

    ix = str(tmp_path / "inc")
    similarity.build_ivf_index(rd.from_items(base).repartition(4), ix,
                               n_centroids=4, rounds=2)
    cents = similarity.ivf_index_centroids(ix)

    # crashed add: uncommitted gen=1 with a bogus vector — invisible
    os.makedirs(os.path.join(ix, "cells", "gen=1", "cell=0"))
    pd.DataFrame({"vec_id": [999999],
                  "embedding": [rows[0]["embedding"]], "gen": [1],
                  "cell": [0]}).to_parquet(
        os.path.join(ix, "cells", "gen=1", "cell=0", "junk.parquet"))
    qids = [1, 2, 4, 5]
    qvecs = np.stack([rows[q]["embedding"] for q in qids])
    mid = similarity.ann_topk_from_index(ix, qvecs, qids, k=5, n_probe=2)
    assert 999999 not in set(mid["neighbor_id"])

    similarity.add_to_ivf_index(rd.from_items(inc).repartition(3), ix)
    assert not os.path.exists(
        os.path.join(ix, "cells", "gen=1", "cell=0", "junk.parquet"))

    full = str(tmp_path / "full")
    similarity.build_ivf_index(rd.from_items(rows).repartition(5), full,
                               centroids=cents)
    a = similarity.ann_topk_from_index(ix, qvecs, qids, k=5, n_probe=2)
    b = similarity.ann_topk_from_index(full, qvecs, qids, k=5, n_probe=2)
    pd.testing.assert_frame_equal(a, b)


def test_embedding_moments_match_numpy_any_layout():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from westa_ocr_ray.similarity import embedding_moments

    rng = np.random.RandomState(4)
    X = rng.randn(200, 8).astype(np.float32) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": [row for row in X]})
    Q = np.round(X.astype(np.float64) * 1000).astype(np.int64)
    M = Q.T @ Q

    for parts in (1, 9):
        out = (embedding_moments(rd.from_pandas(df).repartition(parts))
               .to_pandas())
        cnt = out[(out["i"] == -1) & (out["j"] == -1)]["v"].iloc[0]
        assert int(cnt) == 200
        sums = (out[(out["j"] == -1) & (out["i"] >= 0)]
                .sort_values("i")["v"].to_numpy())
        assert (sums == Q.sum(axis=0)).all()
        tri = out[(out["i"] >= 0) & (out["j"] >= 0)]
        for _, r in tri.iterrows():
            assert int(r["v"]) == int(M[int(r["i"]), int(r["j"])])
        assert len(tri) == 8 * 9 // 2
