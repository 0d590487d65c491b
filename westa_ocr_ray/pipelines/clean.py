"""Corpus-cleaning pipeline — the canonical training-data preprocessing
chain, composed from the engine's operators:

    quality filter (length / token thresholds)
      → exact dedup (content-hash first-wins)
      → [fuzzy dedup (MinHash-LSH + connected components)]

Each stage streams; the only shuffles are on derived keys (hashes).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .. import dedup
from ..relops import semi_anti_filter
from ..text_analysis import _WORD_RE


def quality_filter(ds: rd.Dataset, text_col: str = "text",
                   min_words: int = 5, min_chars: int = 30) -> rd.Dataset:
    """Keep docs passing basic quality thresholds (vectorized)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_words = df[text_col].str.findall(_WORD_RE).map(len)
        n_chars = df[text_col].str.len()
        return df[(n_words >= min_words) & (n_chars >= min_chars)]

    return ds.map_batches(fn, batch_format="pandas")


def dedup_exact_keep(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """Drop exact duplicates, keeping the min-id doc per content hash
    (first-wins): semi-join against the keeper set."""
    keepers = dedup.exact_dedup(ds, id_col=id_col, text_col=text_col)
    keep_ids = set(keepers.to_pandas()["keeper_doc_id"])
    return semi_anti_filter(ds, id_col, keep_ids)


def clean_corpus(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text",
                 min_words: int = 5, min_chars: int = 30,
                 fuzzy: bool = False, jaccard_threshold: float = 0.8) -> rd.Dataset:
    """The full chain; ``fuzzy=True`` adds MinHash-LSH near-dup removal
    (first-wins per connected component)."""
    out = quality_filter(ds, text_col=text_col, min_words=min_words,
                         min_chars=min_chars)
    out = dedup_exact_keep(out, id_col=id_col, text_col=text_col)
    if fuzzy:
        out = dedup.dedup_by_minhash(out, id_col=id_col, text_col=text_col,
                                     jaccard_threshold=jaccard_threshold)
    return out
