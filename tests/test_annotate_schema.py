"""Annotator + schema-enforcer tests (reference test_enhancements.py semantics)."""

from smoldocling_ocr_spark.functions import annotate, schema_enforce


def test_heading_by_font_size_levels():
    ctx = annotate.PageContext(
        [{"type": "text", "content": "body", "font_size": 12.0} for _ in range(5)], 1
    )
    role, attrs = annotate.classify_text_role({"content": "Big Title", "font_size": 24.0}, ctx)
    assert role == "heading" and attrs["level"] == 1
    role, attrs = annotate.classify_text_role({"content": "Sub", "font_size": 19.0}, ctx)
    assert role == "heading" and attrs["level"] == 2


def test_heading_by_pattern():
    ctx = annotate.PageContext([], 1)
    assert annotate.classify_text_role({"content": "1.1 Subsection Title"}, ctx) == ("heading", {"level": 3})
    assert annotate.classify_text_role({"content": "Chapter 4"}, ctx)[1]["level"] == 1
    assert annotate.classify_text_role({"content": "References"}, ctx)[0] == "heading"


def test_list_caption_footnote_equation():
    ctx = annotate.PageContext([], 1)
    assert annotate.classify_text_role({"content": "- an item"}, ctx) == ("list_item", {"type": "unordered"})
    assert annotate.classify_text_role({"content": "2) another"}, ctx) == ("list_item", {"type": "ordered"})
    assert annotate.classify_text_role({"content": "Table 3 shows results"}, ctx) == ("caption", {"for": "table"})
    assert annotate.classify_text_role({"content": "[2] A footnote body"}, ctx) == ("footnote", {"id": "2"})
    assert annotate.classify_text_role({"content": "$$x^2 + y^2 = z^2$$"}, ctx)[0] == "equation"


def test_render_uncertain_and_low_confidence_wraps():
    ctx = annotate.PageContext([], 1)
    out = annotate.render_text({"type": "text", "content": "maybe words here.", "confidence": 0.65}, ctx)
    assert "<!-- confidence:0.65 -->" in out
    assert "[uncertain: maybe words here.]" in out
    out = annotate.render_text({"type": "text", "content": "barely read.", "confidence": 0.4}, ctx)
    assert "[low-confidence: barely read.]" in out


def test_render_noise_role_wins():
    ctx = annotate.PageContext([], 1)
    out = annotate.render_text(
        {"type": "text", "content": "CONFIDENTIAL", "confidence": 0.99, "noise_type": "watermark"}, ctx
    )
    assert "<!-- role:watermark -->" in out
    assert "CONFIDENTIAL" in out  # tagged, not removed


def test_render_page_marker_and_order():
    elements = [
        {"type": "text", "content": "Second", "reading_order": 2, "confidence": 1.0},
        {"type": "text", "content": "First", "reading_order": 1, "confidence": 1.0},
    ]
    out = annotate.render_page(elements, 3)
    assert out.startswith("\n<!-- page:3 -->\n\n")
    assert out.index("First") < out.index("Second")


def test_table_render_with_caption():
    out = annotate.render_table(
        {"type": "table", "content": "| A |\n|---|", "caption": 'Results "final"', "reading_order": 4}
    )
    assert '<!-- role:table caption:"Results \\"final\\""' in out
    assert "**Results \"final\"**" in out


def test_frontmatter_generation_and_injection():
    meta = {"source_file": "a.html", "document_id": "deadbeef", "pages": 2, "confidence_score": 0.91}
    fm = schema_enforce.generate_frontmatter(meta)
    assert fm.startswith("---\ndocument:\n")
    assert '  source_file: "a.html"' in fm
    assert "  confidence_score: 0.9100" in fm
    out = schema_enforce.enforce_schema("Some body text.\nMore.", meta)
    assert out.startswith("---")
    assert "<!-- page:1 -->" in out


def test_page_marker_repair():
    text = "## Page 1\ncontent here\n## Page 2\nmore"
    out = schema_enforce.ensure_page_markers(text)
    assert "<!-- page:1 -->" in out and "<!-- page:2 -->" in out
    assert "## Page" not in out


def test_annotation_injection():
    out = schema_enforce.ensure_annotations("# Title\n\n| a | b |\n")
    lines = out.split("\n")
    assert lines[0] == "<!-- role:heading level:1 -->"
    assert "<!-- role:table -->" in lines


def test_heading_promotion():
    out = schema_enforce.normalize_heading_levels("## A\n\ntext\n\n### B\n")
    assert "\n# A" in "\n" + out
    assert "## B" in out


def test_table_standardization():
    text = "| A | B |\n|---|---|\n| long cell | x |"
    out = schema_enforce.standardize_tables(text)
    lines = out.split("\n")
    assert lines[0] == "| A         | B   |"
    assert lines[1] == "| --------- | --- |"
    assert lines[2] == "| long cell | x   |"


def test_cleanup_formatting():
    out = schema_enforce.cleanup_formatting("a\r\nb   \n\n\n\n\nc")
    assert out == "a\nb\n\n\nc\n"
