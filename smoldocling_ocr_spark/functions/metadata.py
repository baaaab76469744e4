"""Document metadata core.

Reference semantics: /root/reference/metadata_extractor.py — PDF-date parsing
with component defaults (:18-55), SHA-256[:16] deterministic document ids
(:58-75), and YAML frontmatter formatting (:210-265).

Determinism fix vs the reference (SURVEY.md §4.2): ``extraction_date`` is
pinned to the row's ``warc_ts`` instead of ``datetime.now()``.
"""

from __future__ import annotations

import hashlib
from typing import Any


def parse_pdf_date(date_str: str) -> str:
    """``D:YYYYMMDDHHmmSS`` → ISO 8601; missing components default."""
    if not date_str:
        return ""
    if date_str.startswith("D:"):
        date_str = date_str[2:]
    if len(date_str) < 4:
        return ""
    year = date_str[0:4]
    try:
        int(year)
    except ValueError:
        return ""
    month = date_str[4:6] if len(date_str) >= 6 else "01"
    day = date_str[6:8] if len(date_str) >= 8 else "01"
    hour = date_str[8:10] if len(date_str) >= 10 else "00"
    minute = date_str[10:12] if len(date_str) >= 12 else "00"
    second = date_str[12:14] if len(date_str) >= 14 else "00"
    return f"{year}-{month}-{day}T{hour}:{minute}:{second}"


def document_id(payload: bytes) -> str:
    """First 16 hex chars of SHA-256 over the raw payload bytes.

    Spark relational twin: ``substring(sha2(col('html'), 256), 1, 16)``.
    """
    return hashlib.sha256(payload).hexdigest()[:16]


def build_metadata(
    url: str,
    warc_ts: Any,
    payload: bytes,
    pages: int,
    extraction_method: str,
    title: str = "",
    author: str = "",
    creation_date: str = "",
) -> dict[str, Any]:
    ts = warc_ts.isoformat() if hasattr(warc_ts, "isoformat") else str(warc_ts)
    return {
        "source_file": url,
        "pages": pages,
        "title": title,
        "author": author,
        "creation_date": creation_date,
        "file_size_bytes": len(payload),
        "extraction_date": ts,
        "extraction_method": extraction_method,
        "document_id": document_id(payload),
    }
