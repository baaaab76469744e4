"""Layout-bytes payload codec.

The reference's scan path consumes OCR boxes produced by RapidOCR
(/root/reference/structure_engine.py:334-335: ``[box(4 pts), text, score]``).
Native OCR wheels can't ship via ``--py-files`` (SURVEY.md §7.3 item 5), so
the rebuild's scan-path contract is *pre-OCR'd layout bytes*: a deterministic
binary format carrying per-page element boxes, exactly the element relation
the reference builds at structure_engine.py:377-381. The ``html: binary``
column carries either real HTML (→ ``htmlstrip``) or this format.

Format: ``b"DOCLAYv1\\n"`` magic + UTF-8 JSON::

    {"meta": {"title": ..., "author": ..., "creation_date": ...},
     "pages": [{"width": 1275, "height": 1650,
                "elements": [{"type": "text|table|figure", "content": str,
                              "bbox": [x0, y0, x1, y1], "confidence": float,
                              "font_size": float|null}]}]}
"""

from __future__ import annotations

import json
from typing import Any

MAGIC = b"DOCLAYv1\n"


def is_layout_payload(payload: bytes) -> bool:
    return payload.startswith(MAGIC)


def encode_layout(doc: dict[str, Any]) -> bytes:
    return MAGIC + json.dumps(doc, ensure_ascii=False, sort_keys=True).encode("utf-8")


def decode_layout(payload: bytes) -> dict[str, Any]:
    if not is_layout_payload(payload):
        raise ValueError("not a DOCLAYv1 payload")
    doc = json.loads(payload[len(MAGIC):].decode("utf-8"))
    for page in doc.get("pages", []):
        for elem in page.get("elements", []):
            bbox = elem.get("bbox")
            if bbox is not None:
                elem["bbox"] = tuple(bbox)
                elem.setdefault("y", bbox[1])
    return doc
