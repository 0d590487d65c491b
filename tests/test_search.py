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
    before = sorted(glob.glob(os.path.join(out, "postings", "*", "*", "*")))
    build_text_index(rd.from_pandas(df), out, num_buckets=8)
    assert sorted(glob.glob(
        os.path.join(out, "postings", "*", "*", "*"))) == before


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


def test_index_crash_safety(tmp_path):
    """The round-3 advisory scenario: a build or add that dies after
    partially writing postings must not double-count on the re-run.
    Crashed BUILD = marker-less dir → wiped and rebuilt; crashed ADD =
    uncommitted gen subtree → invisible to readers and wiped by the
    re-add. Either way the final lookups equal a clean full rebuild."""
    import os

    import ray.data as rd

    from westa_ocr_ray.search import (add_to_text_index, build_text_index,
                                      text_index_lookup)

    rows = [{"doc_id": i, "text": "alpha beta " + f"rare{i}"}
            for i in range(40)]
    base = [r for r in rows if r["doc_id"] % 2 == 0]
    inc = [r for r in rows if r["doc_id"] % 2 == 1]
    terms = ["alpha", "rare3"]

    # clean reference index over the union corpus
    ix_ref = str(tmp_path / "ref")
    build_text_index(rd.from_items(rows), ix_ref, num_buckets=4)
    want = text_index_lookup(ix_ref, terms, num_buckets=4)

    # crashed BUILD: partial postings exist, no _SUCCESS
    ix = str(tmp_path / "ix")
    os.makedirs(os.path.join(ix, "postings", "gen=0", "bucket=1"))
    junk = os.path.join(ix, "postings", "gen=0", "bucket=1", "junk.parquet")
    pd.DataFrame({"token": ["alpha"], "doc_id": [0], "tf": [99]}
                 ).to_parquet(junk)
    build_text_index(rd.from_items(base), ix, num_buckets=4)
    assert not os.path.exists(junk)  # partial build wiped

    # crashed ADD: an uncommitted gen=1 subtree with bogus counts
    os.makedirs(os.path.join(ix, "postings", "gen=1", "bucket=1"))
    pd.DataFrame({"token": ["alpha"], "doc_id": [1], "tf": [77]}).to_parquet(
        os.path.join(ix, "postings", "gen=1", "bucket=1", "part.parquet"))
    # readers never see the uncommitted generation
    mid = text_index_lookup(ix, ["alpha"], num_buckets=4)
    assert 77 not in set(mid["tf"])
    # the re-run of the add wipes the leftovers and commits whole
    add_to_text_index(rd.from_items(inc), ix, num_buckets=4)
    got = text_index_lookup(ix, terms, num_buckets=4)
    pd.testing.assert_frame_equal(got, want)


def _py_phrase_counts(docs, phrase):
    m = len(phrase)
    out = {}
    for d, text in docs.items():
        toks = text.split(" ")
        n = sum(1 for p in range(len(toks) - m + 1)
                if toks[p:p + m] == list(phrase))
        if n:
            out[d] = n
    return out


def test_phrase_search_from_index_incremental(tmp_path):
    """Positional phrase retrieval equals a direct sliding-window
    recount, including across an incremental-add generation boundary
    and with a REPEATED term in the phrase."""
    docs = _corpus()
    # plant phrases: "merge hash merge" (repeated term) twice in doc 0,
    # once in a doc that arrives via the incremental add
    docs[0] = docs[0] + " merge hash merge x merge hash merge"
    base = {d: t for d, t in docs.items() if d < 40}
    extra = {d: t for d, t in docs.items() if d >= 40}
    extra[99] = "y merge hash merge y"

    idx = str(tmp_path / "pidx")
    search.build_text_index(rd.from_items(
        [{"doc_id": d, "text": t} for d, t in base.items()]), idx,
        num_buckets=8)
    search.add_to_text_index(rd.from_items(
        [{"doc_id": d, "text": t} for d, t in extra.items()]), idx,
        num_buckets=8)

    union = {**base, **extra}
    for phrase in (("merge", "hash", "merge"), ("merge", "hash"),
                   ("alpha", "beta")):
        got = (search.phrase_search_from_index(idx, phrase, num_buckets=8)
               .to_pandas().set_index("doc_id")["n_matches"].to_dict())
        assert got == _py_phrase_counts(union, phrase), phrase
    # absent phrase -> empty
    got = search.phrase_search_from_index(
        idx, ("nosuchtoken", "alpha"), num_buckets=8).to_pandas()
    assert len(got) == 0
