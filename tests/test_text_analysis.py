"""Text-analysis operator tests (quality/tokens vs a pure-python oracle;
langid on hand-written samples; fingerprint stability properties)."""

import pandas as pd
import ray.data as rd

from westa_ocr_ray import text_analysis


def _ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_quality_table_matches_python_oracle():
    rows = [{"doc_id": 1, "text": "the quick brown fox"},
            {"doc_id": 2, "text": "data value row data"},
            {"doc_id": 3, "text": ""}]
    out = (text_analysis.quality_table(_ds(rows)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out["n_chars_norm"]) == [19, 19, 0]
    assert list(out["n_words"]) == [4, 4, 0]
    assert list(out["n_stopwords"]) == [1, 4, 0]


def test_tokens_by_lang_partial_agg():
    rows = [{"doc_id": 1, "text": "a b c", "lang": "en"},
            {"doc_id": 2, "text": "d e", "lang": "en"},
            {"doc_id": 3, "text": "f", "lang": "de"}]
    out = (text_analysis.tokens_by_lang(_ds(rows)).to_pandas()
           .sort_values("lang", ignore_index=True))
    assert list(out["lang"]) == ["de", "en"]
    assert list(out["n_docs"]) == [1, 2]
    assert list(out["n_tokens"]) == [1, 5]


def test_langid_on_real_samples():
    li = text_analysis.LangId()
    assert li.classify("the cat sat on the mat and it was happy") == "en"
    assert li.classify("der hund ist nicht mit der katze und das haus") == "de"
    assert li.classify("le chat est dans la maison et les oiseaux") == "fr"
    assert li.classify("el perro es una mascota del vecino y para todos") == "es"
    assert li.classify("zxqj vvkw pplm") == "unknown"


def test_fingerprint_properties():
    import hashlib

    fp = text_analysis.Fingerprinter(window=4)
    base = "one two three four five six seven eight nine ten"
    assert fp.fingerprint(base) == fp.fingerprint(base)  # deterministic
    assert fp.fingerprint("") == fp.fingerprint("")      # short-doc path
    # winnowing invariant: extending a doc only ADDS windows, so the min
    # can only decrease or stay (it stays iff no new window hashes lower)
    assert fp.fingerprint("zzz " + base) <= fp.fingerprint(base)
    assert fp.fingerprint(base + " more words") <= fp.fingerprint(base)
    assert fp.fingerprint(base) != fp.fingerprint(
        "totally different words with no overlap at all whatsoever right")
    # bit-for-bit the SQL oracle's math: min over md5[:8] of 4-token
    # windows, big-endian, >>1 (queries.ORACLE_SQL['text_fingerprint'])
    toks = base.split(" ")
    exp = min(hashlib.md5(" ".join(toks[i:i + 4]).encode()).digest()[:8]
              for i in range(len(toks) - 3))
    assert fp.fingerprint(base) == int.from_bytes(exp, "big") >> 1


def test_fingerprint_table_runs():
    rows = [{"doc_id": i, "text": f"w{i} common words here for doc {i}"}
            for i in range(10)]
    out = text_analysis.fingerprint_table(_ds(rows)).to_pandas()
    assert len(out) == 10
    assert out["fingerprint"].nunique() > 1


def test_pack_sequences_matches_python_oracle():
    rows = [{"doc_id": 1, "text": " ".join(f"t{i}" for i in range(70))},
            {"doc_id": 2, "text": "only three tokens"},
            {"doc_id": 3, "text": ""}]
    out = (text_analysis.pack_sequences(_ds(rows), seq_len=32).to_pandas()
           .sort_values(["doc_id", "seq_idx"], ignore_index=True))
    exp = []
    for r in rows:
        toks = r["text"].split(" ")
        for s in range((len(toks) + 31) // 32):
            chunk = toks[32 * s:32 * (s + 1)]
            exp.append((r["doc_id"], s, len(chunk), chunk[0]))
    assert list(map(tuple, out.to_numpy())) == exp
    # doc 1: 70 tokens -> 32 + 32 + 6
    assert list(out[out["doc_id"] == 1]["n_tokens"]) == [32, 32, 6]


def test_pack_sequences_greedy_budget_respected():
    rows = [{"doc_id": i, "text": " ".join(["w"] * (5 + 7 * (i % 4)))}
            for i in range(40)]
    out = (text_analysis.pack_sequences_greedy(_ds(rows), budget=30,
                                               buckets=4)
           .to_pandas())
    assert len(out) == 40
    # python oracle: same hash-bucket, same sorted-order greedy fold
    import numpy as np
    df = pd.DataFrame(rows)
    df["n"] = df["text"].str.split(" ").map(len)
    df["bucket"] = (pd.util.hash_pandas_object(df["doc_id"].astype(str),
                                               index=False).to_numpy() % 4)
    for b, g in df.groupby("bucket"):
        g = g.sort_values("doc_id")
        cur, filled, exp = 0, 0, {}
        for did, n in zip(g["doc_id"], g["n"]):
            if filled and filled + n > 30:
                cur, filled = cur + 1, 0
            exp[did] = cur
            filled += n
        sub = out[out["bucket"] == b].set_index("doc_id")["pack_idx"]
        assert {k: int(v) for k, v in sub.items()} == exp
    # every pack's total ≤ budget unless it is a single oversize doc
    tot = out.groupby(["bucket", "pack_idx"])["n_tokens"].agg(["sum", "count"])
    assert ((tot["sum"] <= 30) | (tot["count"] == 1)).all()


def test_pack_sequences_greedy_md5_bucket_matches_python_oracle():
    """The SQL-parity bucket variant: bucket = md5('pg|'||id) % buckets,
    identical greedy fold — layout-independent and equal to a python
    replay (the recursive-CTE oracle in queries.ORACLE_SQL replays the
    same rule in DuckDB)."""
    import hashlib

    import numpy as np

    rows = [{"doc_id": i, "text": " ".join(["w"] * (5 + 7 * (i % 4)))}
            for i in range(40)]
    out = (text_analysis.pack_sequences_greedy(
        _ds(rows).repartition(6), budget=30, buckets=4, bucket_hash="md5")
        .to_pandas())
    df = pd.DataFrame(rows)
    df["n"] = df["text"].str.split(" ").map(len)
    df["bucket"] = df["doc_id"].map(
        lambda i: int.from_bytes(
            hashlib.md5(f"pg|{i}".encode()).digest()[:8], "big") % 4)
    assert (out.sort_values("doc_id")["bucket"].to_numpy()
            == df.sort_values("doc_id")["bucket"].to_numpy()).all()
    for b, g in df.groupby("bucket"):
        g = g.sort_values("doc_id")
        cur, filled, exp = 0, 0, {}
        for did, n in zip(g["doc_id"], g["n"]):
            if filled and filled + n > 30:
                cur, filled = cur + 1, 0
            exp[did] = cur
            filled += n
        sub = out[out["bucket"] == b].set_index("doc_id")["pack_idx"]
        assert {k: int(v) for k, v in sub.items()} == exp


def test_repetition_stats_matches_python_oracle():
    rows = [{"doc_id": 1, "text": "a b a b a b a b"},      # heavy bigram rep
            {"doc_id": 2, "text": "w x y z q r s t u v n o"},  # all distinct
            {"doc_id": 3, "text": "k"},                    # single token
            {"doc_id": 4, "text": "m m m m m m m m m m"}]  # one token repeated
    out = (text_analysis.repetition_stats(_ds(rows)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    from collections import Counter
    for _, r in out.iterrows():
        toks = [t["text"] for t in rows if t["doc_id"] == r["doc_id"]][0].split(" ")
        tc = Counter(toks)
        bc = Counter(a + " " + b for a, b in zip(toks, toks[1:]))
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(tc)
        assert r["max_tok_count"] == max(tc.values())
        assert r["n_bigrams"] == max(len(toks) - 1, 0)
        assert r["max_bigram_count"] == (max(bc.values()) if bc else 0)
        exp_keep = int(max(tc.values()) * 4 <= len(toks)
                       and (max(bc.values()) if bc else 0) * 8
                       <= max(len(toks) - 1, 0))
        assert r["keep"] == exp_keep
    # doc 2 is the only clean one; 1 and 4 trip both rules, 3 trips tok rule
    assert list(out["keep"]) == [0, 1, 0, 0]


def test_build_vocab_matches_pandas():
    import numpy as np
    rows = pd.DataFrame({"text": ["a b b c", "b c d", "c d e e e"]})
    got = (text_analysis.build_vocab(rd.from_pandas(rows), top_v=3)
           .to_pandas().sort_values("rk", ignore_index=True))
    # counts: b=3 c=3 e=3 a=1 d=2 -> top3 by (cnt desc, token asc): b,c,e
    assert list(map(tuple, got.to_numpy())) == [
        ("b", 3, 1), ("c", 3, 2), ("e", 3, 3)]


def test_hash_embed_deterministic_and_counts():
    import hashlib

    import numpy as np
    rows = pd.DataFrame({"doc_id": [1, 2], "text": ["x y x", "z"]})
    got = (text_analysis.hash_embed(rd.from_pandas(rows), dim=8)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    for _, r in got.iterrows():
        assert len(r["vec"]) == 8

    def bucket(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % 8

    v1 = np.zeros(8, dtype=np.int64)
    v1[bucket("x")] += 2
    v1[bucket("y")] += 1
    assert list(got["vec"][0]) == list(v1)
    assert sum(got["vec"][1]) == 1


def test_chunk_tokens_matches_python_oracle():
    texts = {1: "a b c d e f g h i j",        # 10 toks: 1 full + 1 tail
             2: "x y z",                      # <= window: single chunk
             3: " ".join(f"t{i}" for i in range(23)),  # exact multi-chunk
             4: ""}                           # empty -> [''] single chunk
    rows = [{"doc_id": k, "text": v} for k, v in texts.items()]
    out = (text_analysis.chunk_tokens(_ds(rows), window=8, stride=5)
           .to_pandas().sort_values(["doc_id", "chunk_idx"],
                                    ignore_index=True))

    expect = []
    for k, v in texts.items():
        toks = v.split(" ")
        n = len(toks)
        nc = 1 if n <= 8 else -(-(n - 8) // 5) + 1
        for ci in range(nc):
            chunk = toks[ci * 5:ci * 5 + 8]
            expect.append((k, ci, len(chunk), " ".join(chunk)))
    expect.sort()
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == expect
    # consecutive chunks of one doc overlap by window - stride tokens
    d3 = out[out["doc_id"] == 3].reset_index(drop=True)
    for i in range(len(d3) - 1):
        a = d3.loc[i, "chunk_text"].split(" ")
        b = d3.loc[i + 1, "chunk_text"].split(" ")
        assert a[5:] == b[:3]


def test_pii_scrub_counts_and_replacement_order():
    rows = [{"doc_id": 1,
             "text": "mail a@b.co and c.d+x@e.org ip 10.0.0.1 tel "
                     "+81-555-0100 done"},
            {"doc_id": 2, "text": "no pii here"},
            # "u@1.2.3.4" is NOT an email (TLD must be alphabetic), so
            # the later IP rule picks the address up instead
            {"doc_id": 3, "text": "u@1.2.3.4 plus bare 5.6.7.8"}]
    out = (text_analysis.pii_scrub(_ds(rows)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out["n_emails"]) == [2, 0, 0]
    assert list(out["n_ips"]) == [1, 0, 2]
    assert list(out["n_phones"]) == [1, 0, 0]
    assert out.loc[0, "clean_text"] == ("mail <EMAIL> and <EMAIL> ip <IP> "
                                        "tel <PHONE> done")
    assert out.loc[2, "clean_text"] == "u@<IP> plus bare <IP>"


def test_dsir_weights_matches_python_oracle():
    import math

    from westa_ocr_ray.dedup import md5_hex

    rows = [{"doc_id": 1, "lang": "en", "text": "good clean prose here"},
            {"doc_id": 2, "lang": "en", "text": "good good prose"},
            {"doc_id": 3, "lang": "de", "text": "der hund good"},
            {"doc_id": 4, "lang": "fr", "text": "le chat"}]
    B = 16
    out = (text_analysis.dsir_weights(_ds(rows), num_buckets=B)
           .to_pandas().sort_values("doc_id", ignore_index=True))

    bkt = lambda t: int(md5_hex(t)[:8], 16) % B
    raw, tgt = [0] * B, [0] * B
    for r in rows:
        for t in r["text"].split(" "):
            raw[bkt(t)] += 1
            if r["lang"] == "en":
                tgt[bkt(t)] += 1
    R, T = sum(raw), sum(tgt)
    w = [round(1000 * math.log(((tgt[b] + 1.0) * (R + B))
                               / ((raw[b] + 1.0) * (T + B))))
         for b in range(B)]
    expect = [sum(w[bkt(t)] for t in r["text"].split(" ")) for r in rows]
    assert list(out["dsir_w_mn"]) == expect
    # target-language docs should score higher than off-target ones
    assert out.loc[0, "dsir_w_mn"] > out.loc[3, "dsir_w_mn"]


def test_corpus_report_counts_dups_and_tokens():
    rows = [{"lang": "en", "text": "a b c"},
            {"lang": "en", "text": "a b c"},        # exact dup
            {"lang": "en", "text": "longer doc with five"},
            {"lang": "de", "text": "x"}]
    out = (text_analysis.corpus_report(_ds(rows)).to_pandas()
           .sort_values("lang", ignore_index=True))
    de, en = out.iloc[0], out.iloc[1]
    assert (en["n_docs"], en["n_dup_docs"]) == (3, 1)
    assert en["n_tokens"] == 3 + 3 + 4
    assert en["n_chars"] == 5 + 5 + 20
    assert en["max_tokens"] == 4
    assert (de["n_docs"], de["n_dup_docs"], de["n_tokens"]) == (1, 0, 1)


def test_vocab_encode_oov_accounting():
    rows = [{"doc_id": 1, "text": "b b c rare1"},
            {"doc_id": 2, "text": "c b rare2 rare3"},
            {"doc_id": 3, "text": "b c"}]
    # counts: b=4 c=3 rare*=1 each -> top2 vocab = b(rk1), c(rk2)
    out = (text_analysis.vocab_encode(_ds(rows), top_v=2).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(out["n_tok"]) == [4, 4, 2]
    assert list(out["n_oov"]) == [1, 2, 0]
    # id_sum = sum tf*rk over in-vocab tokens
    assert list(out["id_sum"]) == [2 * 1 + 1 * 2, 1 * 1 + 1 * 2, 1 + 2]


def test_quality_classifier_matches_serial_scorer():
    rows = [{"doc_id": 1, "text": "alpha beta gamma"},
            {"doc_id": 2, "text": "single"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "x  y"}]  # empty token between x and y
    out = (text_analysis.quality_classifier(_ds(rows)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    w = text_analysis.classifier_weights()
    from westa_ocr_ray.dedup import md5_hex

    def serial(text):
        toks = [t for t in text.split(" ") if t]
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return sum(int(w[int(md5_hex(g)[:8], 16) % len(w)]) for g in bgs), len(bgs)

    for _, r in out.iterrows():
        s, n = serial(rows[int(r["doc_id"]) - 1]["text"])
        assert (r["score_mu"], r["n_bigrams"]) == (s, n)
        assert r["keep"] == int(s > 0)
    # doc 2 (one token) and doc 3 (empty) have no bigrams -> not kept
    assert list(out["n_bigrams"])[1:3] == [0, 0]
    # doc 4: the empty token is dropped, x/y still form a bigram
    assert out["n_bigrams"].iloc[3] == 1


def test_bpe_train_matches_serial_reference():
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "low lower lowest", "aaa aa aaaa", ""]
    got = text_analysis.bpe_train(
        _ds([{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
        n_merges=6)
    exp = text_analysis.bpe_train_serial(texts, 6)
    assert [(r["lhs"], r["rhs"], int(r["pair_count"]))
            for _, r in got.iterrows()] == exp
    # overlapping-run counting: 'aaa aa aaaa' has (a,a) 2+1+3 times +
    # 'sat'/'mat'/'ate'/'rat' contribute (a,t) — first merge is a
    # deterministic tie-break between them
    assert got["rank"].tolist() == list(range(6))


def test_apply_bpe_merges_greedy_left_to_right():
    # [a,a,a] + (a,a) -> [aa, a], not [a, aa]
    assert text_analysis.apply_bpe_merges("aaa", [("a", "a")]) == ["aa", "a"]
    # merges apply in rank order: (a,a) then (aa,a) -> 'aaaa' = [aa,aa] -> no (aa,a)
    assert text_analysis.apply_bpe_merges("aaaa", [("a", "a"), ("aa", "a")]) \
        == ["aa", "aa"]
    # 'aaaaa' -> (a,a): [aa, aa, a]; (aa,a) matches at index 1 -> [aa, aaa]
    assert text_analysis.apply_bpe_merges("aaaaa", [("a", "a"), ("aa", "a")]) \
        == ["aa", "aaa"]
