"""Corpus-cleaning chain tests (pipelines/clean.py)."""

import pandas as pd
import ray.data as rd

from westa_ocr_ray.pipelines.clean import (clean_corpus, dedup_exact_keep,
                                           quality_filter)

LONG = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon")


def _ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_quality_filter_thresholds():
    rows = [{"doc_id": 1, "text": LONG},
            {"doc_id": 2, "text": "too short"},
            {"doc_id": 3, "text": "a b c d e f"}]  # 6 words but < 30 chars
    out = quality_filter(_ds(rows), min_words=5, min_chars=30).to_pandas()
    assert list(out["doc_id"]) == [1]


def test_dedup_exact_keep_first_wins():
    rows = [{"doc_id": 2, "text": LONG}, {"doc_id": 1, "text": LONG},
            {"doc_id": 3, "text": "different " + LONG}]
    out = dedup_exact_keep(_ds(rows)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_clean_corpus_full_chain():
    rows = [{"doc_id": 1, "text": LONG},
            {"doc_id": 2, "text": LONG},                       # exact dup
            {"doc_id": 3, "text": LONG + " extra tail words"}, # near dup
            {"doc_id": 4, "text": "short"},                    # fails quality
            {"doc_id": 5, "text": "completely different words entirely "
                                  "unrelated content nothing shared here pals"}]
    kept = clean_corpus(_ds(rows), fuzzy=True, jaccard_threshold=0.5).to_pandas()
    ids = set(kept["doc_id"])
    assert 1 in ids and 5 in ids
    assert 2 not in ids and 4 not in ids
    assert 3 not in ids  # fuzzy near-dup removed
