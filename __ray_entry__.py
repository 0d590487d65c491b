"""Driver contract for the westa_ocr_ray engine.

The driver calls ray.init() itself before importing this module; nothing
here (or in the library) calls ray.init/ray.shutdown. Only bench.py,
scripts/, and the test fixture own a Ray session.

- entry(): flagship extraction pipeline on the smoke-tier interleaved
  fixture corpus (the input shape mandated by BASELINE.json.input_hint;
  synthesized deterministically — see westa_ocr_ray/fixtures.py).
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2
  coverage map in westa_ocr_ray/queries.py docstring).
- oracle_sql(): DuckDB-runnable oracles for the SQL-expressible subset;
  the extraction pipelines' oracle is the single-process reference
  implementation asserted by `python -m pytest -x -q`
  (tests/test_pipeline_e2e.py span-sequence equality).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from westa_ocr_ray import fixtures
    from westa_ocr_ray.config import ExtractConfig
    from westa_ocr_ray.pipelines.extract import extract_dataset, read_documents

    corpus = fixtures.ensure_corpus("smoke")
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8, extract_concurrency=(1, 4))
    return extract_dataset(read_documents(corpus), cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    from westa_ocr_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from westa_ocr_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
