"""Layout analysis tests (ported semantics: reference test_layout_analyzer.py)."""

from smoldocling_ocr_spark.functions import layout


def _elems(*boxes, **kw):
    return [{"bbox": b, "content": kw.get("content", "x"), "confidence": 0.95} for b in boxes]


def test_single_column():
    elements = _elems((50, 100, 250, 120), (50, 130, 250, 150), (50, 160, 250, 180))
    assert len(layout.detect_columns(elements)) == 1


def test_two_columns():
    elements = _elems((50, 100, 250, 120), (350, 100, 550, 120), (50, 130, 250, 150), (350, 130, 550, 150))
    cols = layout.detect_columns(elements)
    assert len(cols) == 2
    assert cols[0]["x_min"] < cols[1]["x_min"]


def test_three_columns():
    elements = _elems((50, 100, 200, 120), (270, 100, 420, 120), (490, 100, 640, 120))
    assert len(layout.detect_columns(elements)) == 3


def test_column_assignment():
    elements = [
        {"bbox": (50, 100, 250, 120), "content": "Col1"},
        {"bbox": (350, 100, 550, 120), "content": "Col2"},
    ]
    cols = layout.detect_columns(elements)
    layout.assign_columns(elements, cols)
    assert elements[0]["column_id"] == 0
    assert elements[1]["column_id"] == 1


def test_nearest_column_fallback():
    elements = [{"bbox": (50, 100, 100, 120)}, {"bbox": (400, 100, 450, 120)}]
    cols = layout.detect_columns(elements)
    stray = {"bbox": (390, 200, 800, 220)}  # center 595 outside both ranges
    layout.assign_columns([stray], cols)
    assert stray["column_id"] == 1


def test_xy_cut_single_column_order():
    elements = [
        {"bbox": (50, 200, 250, 220), "column_id": 0, "content": "Third"},
        {"bbox": (50, 100, 250, 120), "column_id": 0, "content": "First"},
        {"bbox": (50, 150, 250, 170), "column_id": 0, "content": "Second"},
    ]
    ordered = layout.xy_cut_order(elements)
    assert [e["content"] for e in ordered] == ["First", "Second", "Third"]
    assert ordered[0]["reading_order"] == 1
    assert ordered[2]["reading_order"] == 3


def test_xy_cut_two_column_order():
    elements = [
        {"bbox": (350, 150, 550, 170), "column_id": 1, "content": "Col2-Line2"},
        {"bbox": (50, 100, 250, 120), "column_id": 0, "content": "Col1-Line1"},
        {"bbox": (350, 100, 550, 120), "column_id": 1, "content": "Col2-Line1"},
        {"bbox": (50, 150, 250, 170), "column_id": 0, "content": "Col1-Line2"},
    ]
    ordered = layout.xy_cut_order(elements)
    assert [e["content"] for e in ordered] == ["Col1-Line1", "Col1-Line2", "Col2-Line1", "Col2-Line2"]


def test_confidence_split_and_postfix():
    elements = [
        {"bbox": (50, 100, 250, 130), "content": "Good text here", "confidence": 0.95},
        {"bbox": (50, 150, 250, 170), "content": "low quality text", "confidence": 0.55},
    ]
    result = layout.analyze_page(elements)
    assert result["high_confidence_count"] == 1
    assert result["low_confidence_count"] == 1
    last = result["elements"][-1]
    assert last["uncertain"] is True
    assert last["reading_order"] == 2  # appended after the ordered run
    assert last["semantic_role"] == "paragraph"


def test_bullet_early_exit():
    stats = {"avg_height": 20, "avg_spacing": 30, "page_width": 600, "page_left": 50, "page_height": 800}
    elem = {"content": "• a bullet item", "bbox": (50, 100, 250, 120)}
    role, conf = layout.classify_role_enhanced(elem, stats, None, None)
    assert (role, conf) == ("list_item", 0.95)


def test_short_numbered_is_list_long_numbered_falls_through():
    stats = {"avg_height": 20, "avg_spacing": 30, "page_width": 600, "page_left": 50, "page_height": 800}
    short = {"content": "1. Buy milk and eggs", "bbox": (50, 100, 250, 120)}
    assert layout.classify_role_enhanced(short, stats, None, None)[0] == "list_item"
    long_text = "1. For investments in sectors listed in a notification issued by the relevant authority pursuant to law"
    long_elem = {"content": long_text, "bbox": (50, 100, 550, 120)}
    assert layout.classify_role_enhanced(long_elem, stats, None, None)[0] != "list_item"


def test_allcaps_large_heading():
    elements = [
        {"bbox": (200, 100, 600, 140), "content": "INTRODUCTION", "confidence": 0.95},
        {"bbox": (50, 200, 550, 220), "content": "Body text " * 10, "confidence": 0.95},
        {"bbox": (50, 240, 550, 260), "content": "More body text here " * 8, "confidence": 0.95},
        {"bbox": (50, 280, 550, 300), "content": "Another line of body content " * 6, "confidence": 0.95},
    ]
    result = layout.analyze_page(elements)
    roles = {e["content"][:12]: e["semantic_role"] for e in result["elements"]}
    assert roles["INTRODUCTION"] == "heading"


def test_caption_keyword_special_case():
    stats = {"avg_height": 20, "avg_spacing": 30, "page_width": 600, "page_left": 50, "page_height": 800}
    elem = {"content": "Figure 3: An example", "bbox": (50, 100, 250, 120)}
    assert layout.classify_role_enhanced(elem, stats, None, None) == ("caption", 0.85)


def test_footnote_bottom_small():
    stats = {"avg_height": 20, "avg_spacing": 30, "page_width": 600, "page_left": 50, "page_height": 800}
    elem = {"content": "see appendix for details and more words", "bbox": (50, 700, 250, 710)}
    assert layout.classify_role_enhanced(elem, stats, None, None) == ("footnote", 0.8)
