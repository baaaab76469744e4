"""End-to-end semantic assertions on a crafted layout document (the
reference's test_detection.py style: known structure in, specific tags out)."""

from __future__ import annotations

import datetime as dt

from smoldocling_ocr_spark.functions.extract import extract_document
from smoldocling_ocr_spark.functions.layoutcodec import encode_layout


def _crafted_payload() -> bytes:
    width, height = 1275.0, 1650.0

    names = {1: "ALPHA", 2: "BETA", 3: "GAMMA"}

    def page(page_no: int) -> dict:
        word = names[page_no]
        elements = [
            # repeating header (every page, top zone)
            {"type": "text", "content": "Company Name Inc.", "bbox": [60, 10, 360, 30], "confidence": 0.98, "font_size": None},
            # ALL-CAPS large heading with whitespace gap
            {"type": "text", "content": f"SECTION {word}", "bbox": [60, 150, 480, 190], "confidence": 0.97, "font_size": None},
            # body paragraphs
            {"type": "text", "content": f"This is the {word} body paragraph with plenty of ordinary words in it for scoring.", "bbox": [60, 260, 560, 282], "confidence": 0.95, "font_size": None},
            {"type": "text", "content": f"The {word} follow-up paragraph continues with more routine page-specific content.", "bbox": [60, 315, 560, 337], "confidence": 0.94, "font_size": None},
            # bullet list item (early-exit rule)
            {"type": "text", "content": "• bullet item number one", "bbox": [80, 370, 420, 390], "confidence": 0.96, "font_size": None},
            # table + caption within 100px
            {"type": "text", "content": "Table 1: Crafted sample", "bbox": [60, 430, 420, 448], "confidence": 0.96, "font_size": None},
            {"type": "table", "content": "| K | V |\n|---|---|\n| a | 1 |", "bbox": [60, 460, 520, 560], "confidence": 0.9, "font_size": None},
            # uncertain element (0.5 <= conf < 0.7)
            {"type": "text", "content": "barely readable scribble", "bbox": [60, 600, 460, 620], "confidence": 0.62, "font_size": None},
            # artifact
            {"type": "text", "content": "|||---===", "bbox": [80, 660, 180, 675], "confidence": 0.2, "font_size": None},
            # body line referencing a footnote + footnote content in bottom 20%
            {"type": "text", "content": f"A {word} claim that needs support [1].", "bbox": [60, 700, 460, 722], "confidence": 0.95, "font_size": None},
            {"type": "text", "content": f"[1] The supporting footnote for the {word} section.", "bbox": [60, 1430, 460, 1444], "confidence": 0.93, "font_size": None},
            # watermark + page number (bottom zone)
            {"type": "text", "content": "DRAFT", "bbox": [80, 900, 200, 918], "confidence": 0.97, "font_size": None},
            {"type": "text", "content": f"Page {page_no} of 3", "bbox": [60, 1568, 210, 1582], "confidence": 0.99, "font_size": None},
        ]
        return {"width": width, "height": height, "elements": elements}

    return encode_layout(
        {
            "meta": {"title": "Crafted Doc", "author": "T. Author", "creation_date": "2023-01-02T00:00:00"},
            "pages": [page(i) for i in (1, 2, 3)],
        }
    )


def test_crafted_document_semantics():
    res = extract_document(
        "https://example.com/crafted.pdf", dt.datetime(2024, 3, 1), _crafted_payload(), None
    )
    md = res["markdown"]

    # frontmatter with pinned extraction date and sha-derived id
    assert md.startswith("---\ndocument:")
    assert 'extraction_date: "2024-03-01T00:00:00"' in md
    assert f'document_id: "{res["document_id"]}"' in md

    # page markers 1..3
    for n in (1, 2, 3):
        assert f"<!-- page:{n} -->" in md

    # repeating header tagged (not removed) on every page
    assert md.count("Company Name Inc.") == 3
    assert md.count("<!-- role:header -->") == 3

    # ALL-CAPS heading classified and promoted to H1 (min level rule)
    assert "# SECTION ALPHA" in md
    assert "<!-- role:heading" in md

    # bullet early-exit
    assert "<!-- role:list_item type:unordered -->" in md

    # caption linked to table: standalone caption line gone, caption attr on table
    assert 'caption:"Crafted sample"' in md
    assert "**Crafted sample**" in md
    assert "\nTable 1: Crafted sample\n" not in md

    # table re-padded to column width >= 3
    assert "| a   | 1   |" in md

    # uncertain wrap with confidence comment
    assert "<!-- confidence:0.62 -->" in md
    assert "[uncertain: barely readable scribble]" in md

    # artifact tagged and wrapped as low-confidence, not removed
    assert "<!-- role:artifact -->" in md
    assert "[low-confidence: |||---===]" in md

    # footnote linked with id
    assert "<!-- role:footnote id:1 -->" in md

    # watermark + page-number noise tags
    assert "<!-- role:watermark -->" in md and "DRAFT" in md
    assert md.count("<!-- role:page_number -->") == 3

    # reading order annotations restart per page
    assert md.count("<!-- reading-order:1 -->") == 3

    # quality metrics surface
    assert res["pages"] == 3
    assert res["captions_linked"] == 3
    assert res["footnotes_linked"] == 3
    assert res["gate_passed"] is True
    assert 0.0 < res["confidence_score"] <= 1.0


def test_span_heuristics():
    from smoldocling_ocr_spark.functions.spans import (
        body_font_mode,
        classify_digital_block,
        drop_blocks_in_tables,
        overlap_fraction,
    )

    assert body_font_mode([12.1, 11.9, 12.0, 18.0]) == 12.0
    assert classify_digital_block(20.0, 12.0) == "#"      # ratio 1.67
    assert classify_digital_block(14.0, 12.0) == "##"     # ratio 1.17
    assert classify_digital_block(12.0, 12.0) is None     # body
    assert classify_digital_block(36.0, 12.0) is None     # > 2.5x → decorative

    assert overlap_fraction((0, 0, 10, 10), (0, 0, 5, 10)) == 0.5
    blocks = [
        {"bbox": (0, 0, 10, 10), "content": "inside"},
        {"bbox": (100, 100, 120, 120), "content": "outside"},
    ]
    kept = drop_blocks_in_tables(blocks, [(0, 0, 10, 7)])  # 70% overlap
    assert [b["content"] for b in kept] == ["outside"]


def test_html_acceptance_gate_requires_chars_and_words():
    """The digital-route acceptance gate mirrors the reference's conjunct
    (structure_engine.py:914-928): >100 chars AND >100 words. A long
    single-token blob (chars pass, words fail) must fall back to the text
    column; a normal article (both pass) routes html_dom."""
    ts = dt.datetime(2024, 3, 1)
    blob = "<html><body><p>" + "x" * 300 + "</p></body></html>"
    res = extract_document("https://x/blob.html", ts, blob.encode(), "fallback words")
    assert res["method"] == "text_layer"

    words = " ".join(f"word{i}" for i in range(150))
    article = f"<html><body><p>{words}</p></body></html>"
    res = extract_document("https://x/article.html", ts, article.encode(), "")
    assert res["method"] == "html_dom"
