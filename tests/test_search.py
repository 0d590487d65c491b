"""BM25 search tests: exactness vs a single-process python oracle on a
small synthetic corpus, plus edge behavior (absent term, k > corpus)."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from westa_ocr_ray import search


def _py_bm25(docs, terms, k1=search.BM25_K1, b=search.BM25_B):
    terms = sorted(terms)
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    out = {}
    for d, tk in toks.items():
        s = 0.0
        dl = float(len(tk))
        for t in terms:
            tf = float(tk.count(t))
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (dl / avgdl)))
        out[d] = math.floor(s * 1000000.0)
    return out


def _corpus():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "merge", "hash"]
    docs = {}
    for i in range(60):
        words = rng.choice(vocab, size=rng.integers(3, 25)).tolist()
        docs[i] = " ".join(words)
    return docs


def test_bm25_matches_python_oracle():
    docs = _corpus()
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())})).repartition(5)
    got = (search.bm25_topk(ds, ["merge", "hash"], k=10)
           .to_pandas().sort_values("rank", ignore_index=True))
    exp = _py_bm25(docs, ["merge", "hash"])
    order = sorted(exp, key=lambda d: (-exp[d], d))[:10]
    assert list(got["doc_id"]) == order
    assert list(got["score_micro"]) == [exp[d] for d in order]
    assert list(got["rank"]) == list(range(1, 11))


def test_bm25_absent_term_and_small_k():
    docs = {0: "alpha beta", 1: "beta beta gamma", 2: "alpha"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    # 'zzz' never occurs: df=0, idf=ln((n+0.5)/0.5) but tf=0 everywhere →
    # that term contributes 0; ranking driven by 'beta' alone
    got = (search.bm25_topk(ds, ["beta", "zzz"], k=5)
           .to_pandas().sort_values("rank", ignore_index=True))
    assert len(got) == 3  # k > corpus size: all docs returned once
    exp = _py_bm25(docs, ["beta", "zzz"])
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert list(got["doc_id"]) == order


def test_text_index_build_lookup_roundtrip(tmp_path):
    """Persisted inverted index: lookup through the bucket partitions
    equals a direct pandas tf count; _SUCCESS makes re-builds no-ops;
    only the probed buckets' files are touched."""
    import glob
    import os

    import numpy as np
    import ray.data as rd

    from westa_ocr_ray.search import build_text_index, text_index_lookup

    rows = [{"doc_id": i,
             "text": " ".join(["alpha", "beta"] * (i % 3 + 1)
                              + [f"rare{i}"])}
            for i in range(60)]
    df = pd.DataFrame(rows)
    out = str(tmp_path / "tix")
    build_text_index(rd.from_pandas(df).repartition(5), out, num_buckets=8)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    got = text_index_lookup(out, ["alpha", "rare7", "nosuch"],
                            num_buckets=8)
    exp = (df.assign(token=df["text"].str.split(" "))
           .explode("token").groupby(["token", "doc_id"]).size()
           .reset_index(name="tf"))
    exp = (exp[exp["token"].isin(["alpha", "rare7"])]
           .sort_values(["token", "doc_id"], ignore_index=True))
    assert list(got["token"]) == list(exp["token"])
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["tf"]) == list(exp["tf"].astype(np.int64))

    # resume: marker short-circuits (mutate the postings dir; the
    # build must NOT touch it again)
    probe = os.path.join(out, "postings", "bucket=0")
    before = sorted(glob.glob(os.path.join(out, "postings", "*", "*")))
    build_text_index(rd.from_pandas(df), out, num_buckets=8)
    assert sorted(glob.glob(os.path.join(out, "postings", "*", "*"))) == before
    del probe


def test_bm25_from_index_bit_identical_to_full_scan(tmp_path):
    """The index-served BM25 must reproduce the full-corpus-scan BM25
    exactly (same floats, same floor-micro, same ranks) — including
    zero-hit docs entering the tail of the ranking via doclen."""
    import numpy as np
    import ray.data as rd

    from westa_ocr_ray.search import (bm25_from_index, bm25_topk,
                                      build_text_index)

    rng = np.random.RandomState(2)
    vocab = [f"w{i}" for i in range(30)] + ["merge", "hash"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab,
                                          size=rng.randint(5, 40)))}
            for i in range(120)]
    ds = rd.from_items(rows).repartition(6)
    terms = ["merge", "hash", "nosuchterm"]

    full = (bm25_topk(ds, terms, k=30).to_pandas()
            .sort_values("rank", ignore_index=True))
    out = str(tmp_path / "ix")
    build_text_index(ds, out, num_buckets=8)
    fromix = (bm25_from_index(out, terms, k=30, num_buckets=8).to_pandas()
              .sort_values("rank", ignore_index=True))
    pd.testing.assert_frame_equal(
        full[["doc_id", "score_micro", "rank"]],
        fromix[["doc_id", "score_micro", "rank"]])


def test_add_to_text_index_equals_full_rebuild(tmp_path):
    """Incremental add: postings/doclen/stats extend in place, and both
    term lookups and index-served BM25 equal a full rebuild over the
    union corpus."""
    import numpy as np
    import ray.data as rd

    from westa_ocr_ray.search import (add_to_text_index, bm25_from_index,
                                      build_text_index, text_index_lookup)

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(20)] + ["merge", "hash"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab,
                                          size=rng.randint(5, 30)))}
            for i in range(90)]
    base = [r for r in rows if r["doc_id"] % 3 != 0]
    inc = [r for r in rows if r["doc_id"] % 3 == 0]

    ix_inc = str(tmp_path / "inc")
    build_text_index(rd.from_items(base).repartition(4), ix_inc,
                     num_buckets=8)
    add_to_text_index(rd.from_items(inc).repartition(3), ix_inc,
                      num_buckets=8)

    ix_full = str(tmp_path / "full")
    build_text_index(rd.from_items(rows).repartition(5), ix_full,
                     num_buckets=8)

    terms = ["merge", "hash", "w3"]
    a = text_index_lookup(ix_inc, terms, num_buckets=8)
    b = text_index_lookup(ix_full, terms, num_buckets=8)
    pd.testing.assert_frame_equal(a, b)

    fa = (bm25_from_index(ix_inc, terms, k=25, num_buckets=8).to_pandas()
          .sort_values("rank", ignore_index=True))
    fb = (bm25_from_index(ix_full, terms, k=25, num_buckets=8).to_pandas()
          .sort_values("rank", ignore_index=True))
    pd.testing.assert_frame_equal(fa, fb)
