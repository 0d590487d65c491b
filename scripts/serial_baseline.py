"""Single-process (no Ray) extraction baseline over the fixture corpus:
reads the parquet, runs the same pure extraction kernels serially —
the honest 'reference-style single-threaded loop' number that the Ray
pipeline's docs/sec is compared against in BASELINE.md.

Usage: python scripts/serial_baseline.py [tier] [max_docs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.dataset as pads  # noqa: E402

from westa_ocr_ray import fixtures, oracle  # noqa: E402


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "correctness"
    max_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    d = fixtures.ensure_corpus(tier)
    table = pads.dataset(d).to_table()
    rows = table.to_pylist()[:max_docs]
    mkeys = fixtures.master_keys(fixtures.DEFAULT_SEED)
    # warm-up not needed; pure python. Time the extraction loop only.
    t0 = time.perf_counter()
    seen = set()
    n_spans = 0
    for doc in rows:
        if doc["doc_id"] in seen:
            continue
        seen.add(doc["doc_id"])
        res = oracle.extract_doc(doc, fixtures.DEFAULT_SEED, mkeys)
        n_spans += len(res["spans"])
    wall = time.perf_counter() - t0
    print(json.dumps({
        "tier": tier, "docs": len(seen), "spans": n_spans,
        "wall_sec": round(wall, 2),
        "docs_per_sec_serial": round(len(seen) / wall, 1),
    }))


if __name__ == "__main__":
    main()
