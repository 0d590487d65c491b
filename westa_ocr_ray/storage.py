"""Physical-storage seam (SURVEY.md §7): the logical table is the Lance
table mandated by BASELINE.json.input_hint; this sandbox has no `lance`
module, so the physical format falls back to Parquet with the identical
logical schema. Swapping to Lance is contained to this file.
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd

try:  # pragma: no cover - lance absent in this environment
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: Optional[list] = None,
               num_blocks: Optional[int] = None) -> rd.Dataset:
    """Read a logical Lance table (Lance if importable, else Parquet)."""
    if HAVE_LANCE:
        ds = rd.read_lance(path, columns=columns)
        return ds
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    return rd.read_parquet(path, **kwargs)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE:
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
