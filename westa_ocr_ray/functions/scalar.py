"""Scalar function library (SURVEY.md §2.8) — the reference's string /
masking / templating helpers re-expressed as pure functions plus
vectorized batch kernels for use inside map_batches.

Reference parity (behavioral, not copied):
- regex_extract_first       ← GAS extractUsingRegex (docs/...md:416-419)
- extract_drive_id          ← GAS extractDriveFileId (docs/...md:332-336)
                              and app/file_fetcher.py:71-81 normalization
- mask_token                ← app/admin.py:92-100 (abcd…xy masking)
- preview                   ← prompt preview truncate + newline strip
                              (app/gemini.py:67, app/repository.py:455)
- csv_quote / build_masters_csv ← GAS master CSV build (docs/...md:57-70)
- substitute_template       ← {current_date} substitution (docs/...md:85-86);
                              deterministic: the date is an argument, never now()
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

_DRIVE_ID_RE = re.compile(r"[-\w]{25,}")


def regex_extract_first(text: str, pattern: str) -> str:
    """First capture group of the first match, trimmed; '' if no match."""
    m = re.search(pattern, text)
    if not m:
        return ""
    return (m.group(1) if m.groups() else m.group(0)).strip()


def extract_drive_id(url_or_id: str) -> str:
    """Extract a [-\\w]{25,} file id from a URL/bare id; raises ValueError
    if absent (GAS throws)."""
    m = _DRIVE_ID_RE.search(url_or_id)
    if not m:
        raise ValueError(f"no file id found in: {url_or_id!r}")
    return m.group(0)


def mask_token(token: Optional[str]) -> str:
    """abcd…wxyz masking of secrets for logs/lineage."""
    if not token:
        return ""
    if len(token) <= 8:
        return "*" * len(token)
    return f"{token[:4]}…{token[-4:]}"


def preview(text: str, limit: int = 200) -> str:
    """Truncated single-line preview (prompt/raw-text logging)."""
    return text[:limit].replace("\n", " ")


def csv_quote(value: str) -> str:
    """RFC-4180-ish quoting: wrap when needed, double inner quotes."""
    if any(c in value for c in ',"\n'):
        return '"' + value.replace('"', '""') + '"'
    return value


def build_masters_csv(rows: Sequence[Dict[str, str]], pattern: str,
                      columns: Sequence[str] = ("key", "value")) -> str:
    """Filter master rows by pattern and serialize to CSV — the
    broadcast-small-side build step (filter + projection at pipeline
    build time, then ray.put / constructor-arg broadcast)."""
    out: List[str] = [",".join(columns)]
    for r in rows:
        if r.get("pattern") == pattern:
            out.append(",".join(csv_quote(str(r.get(c, ""))) for c in columns))
    return "\n".join(out)


def substitute_template(template: str, variables: Dict[str, str]) -> str:
    """`{name}` substitution; unknown placeholders left intact.
    Determinism contract: values (e.g. current_date) are passed in."""
    out = template
    for k, v in variables.items():
        out = out.replace("{" + k + "}", v)
    return out
