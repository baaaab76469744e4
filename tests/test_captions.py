"""Caption/footnote linking tests (reference caption_extractor.py:318-328 fixture)."""

from smoldocling_ocr_spark.functions import captions


def test_parse_caption():
    assert captions.parse_caption("Table 1: Sample Data") == {"kind": "table", "number": 1, "text": "Sample Data"}
    assert captions.parse_caption("figure 12. A diagram") == {"kind": "figure", "number": 12, "text": "A diagram"}
    assert captions.parse_caption("Chart 2") == {"kind": "figure", "number": 2, "text": ""}
    assert captions.parse_caption("Ordinary sentence.") is None


def test_link_caption_to_table_and_footnote():
    pages = [
        [
            {"type": "text", "content": "Table 1: Sample Data", "y": 90},
            {"type": "table", "content": "| A | B |\n|---|---|", "y": 100},
            {"type": "text", "content": "This is body text with a footnote [1].", "y": 200},
            {"type": "text", "content": "[1] This is the footnote content.", "y": 700},
        ]
    ]
    out, report = captions.link_document(pages, [800.0])
    assert report["captions_linked"] == 1
    assert report["tables"] == 1
    table = [e for e in out[0] if e.get("type") == "table"][0]
    assert table["caption"] == "Sample Data"
    assert table["caption_number"] == 1
    # standalone caption removed
    assert not any(e.get("content", "").startswith("Table 1:") for e in out[0] if e["type"] == "text")
    footnote = [e for e in out[0] if e.get("footnote_id")][0]
    assert footnote["semantic_role"] == "footnote"
    assert footnote["footnote_id"] == "1"
    assert report["footnotes"] == 1


def test_caption_beyond_proximity_not_linked():
    pages = [
        [
            {"type": "text", "content": "Figure 1: Far away", "y": 50},
            {"type": "figure", "content": "[Figure]", "y": 400},
        ]
    ]
    out, report = captions.link_document(pages, [800.0])
    assert report["captions_linked"] == 0
    fig = [e for e in out[0] if e["type"] == "figure"][0]
    assert "caption" not in fig


def test_footnote_above_bottom_zone_ignored():
    pages = [[{"type": "text", "content": "[1] Not a footnote, too high.", "y": 100}]]
    out, _ = captions.link_document(pages, [800.0])
    assert out[0][0].get("semantic_role") != "footnote"
