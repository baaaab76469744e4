"""Export format conversion (md → txt / html) and content stats.

Reference semantics: /root/reference/app.py:121-192 (markdown_to_html via
markdown2 + a styled shell, markdown_to_txt regex strip chain) and
utils/formatters.py:16-45 (word/char counts, additive quality rubric).
markdown2/python-docx aren't shippable pure-Python deps here, so the HTML
renderer is a minimal deterministic subset (headings, tables, lists, code
fences, paragraphs) sufficient for the export sink; txt strip is exact.
"""

from __future__ import annotations

import html as _html
import re

_HEADING_MARK = re.compile(r"#{1,6}\s")
_BOLD = re.compile(r"\*\*(.+?)\*\*")
_ITAL = re.compile(r"\*(.+?)\*")
_CODE = re.compile(r"`(.+?)`")
_LINK = re.compile(r"\[(.+?)\]\(.+?\)")
_HEADING_LINE = re.compile(r"^(#{1,6})\s+(.*)$")


def markdown_to_txt(markdown_text: str) -> str:
    """Strip markdown syntax (app.py:185-192 regex chain, verbatim order)."""
    text = _HEADING_MARK.sub("", markdown_text)
    text = _BOLD.sub(r"\1", text)
    text = _ITAL.sub(r"\1", text)
    text = _CODE.sub(r"\1", text)
    text = _LINK.sub(r"\1", text)
    return text


def _render_inline(line: str) -> str:
    out = _html.escape(line)
    out = re.sub(r"\*\*(.+?)\*\*", r"<strong>\1</strong>", out)
    out = re.sub(r"\*(.+?)\*", r"<em>\1</em>", out)
    out = re.sub(r"`(.+?)`", r"<code>\1</code>", out)
    return out


def markdown_to_html(markdown_text: str) -> str:
    """Deterministic minimal markdown→HTML body (tables, headings, lists,
    fenced code, paragraphs); comments (annotations) are preserved as-is."""
    lines = markdown_text.split("\n")
    out: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            i += 1
            continue
        if stripped.startswith("<!--"):
            out.append(stripped)
            i += 1
            continue
        if stripped.startswith("```"):
            code: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("```"):
                code.append(lines[i])
                i += 1
            i += 1
            out.append("<pre><code>" + _html.escape("\n".join(code)) + "</code></pre>")
            continue
        m = _HEADING_LINE.match(stripped)
        if m:
            level = len(m.group(1))
            out.append(f"<h{level}>{_render_inline(m.group(2))}</h{level}>")
            i += 1
            continue
        if stripped.startswith("|"):
            rows: list[str] = []
            while i < len(lines) and lines[i].strip().startswith("|"):
                rows.append(lines[i].strip())
                i += 1
            out.append("<table>")
            for r_idx, row in enumerate(rows):
                cells = [c.strip() for c in row.strip("|").split("|")]
                if r_idx == 1 and all(re.match(r"^:?-+:?$", c) for c in cells if c):
                    continue
                tag = "th" if r_idx == 0 else "td"
                out.append("<tr>" + "".join(f"<{tag}>{_render_inline(c)}</{tag}>" for c in cells) + "</tr>")
            out.append("</table>")
            continue
        if stripped.startswith(("- ", "* ")):
            out.append("<ul>")
            while i < len(lines) and lines[i].strip().startswith(("- ", "* ")):
                out.append(f"<li>{_render_inline(lines[i].strip()[2:])}</li>")
                i += 1
            out.append("</ul>")
            continue
        out.append(f"<p>{_render_inline(stripped)}</p>")
        i += 1
    return "\n".join(out)


def count_stats(markdown_text: str) -> tuple[int, int]:
    """(words, chars) — utils/formatters.py:16-20."""
    return len(markdown_text.split()), len(markdown_text)


def estimate_quality_score(markdown_text: str, method_used: str) -> int:
    """Additive 0-100 rubric (utils/formatters.py:23-45): base 50 + method
    bonus + headings/tables/length bonuses, capped at 100."""
    score = 50
    # pdf_parse_failed is the lineage label for the text-column fallback
    # after a failed PDF parse — the rendered body is the same text-layer
    # content, so it keeps the text_layer bonus (the label exists for
    # failure accounting, not to re-score the output)
    method_bonus = {
        "cloud_llm": 30,
        "layout_ocr": 20,
        "html_dom": 15,
        "text_layer": 15,
        "pdf_parse_failed": 15,
    }
    score += method_bonus.get(method_used, 0)
    if "##" in markdown_text:
        score += 10
    if "|" in markdown_text:
        score += 10
    if len(markdown_text) > 1000:
        score += 10
    return min(100, score)


_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>'
    "</Types>"
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_DOCX_DOC_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_DOCX_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<w:styles xmlns:w="{_W}">'
    + "".join(
        f'<w:style w:type="paragraph" w:styleId="Heading{n}">'
        f'<w:name w:val="heading {n}"/><w:basedOn w:val="Normal"/>'
        f'<w:rPr><w:b/><w:sz w:val="{40 - 4 * n}"/></w:rPr></w:style>'
        for n in (1, 2, 3)
    )
    + '<w:style w:type="paragraph" w:styleId="ListBullet"><w:name w:val="List Bullet"/></w:style>'
    "</w:styles>"
)


def _docx_paragraph(text: str, style: str | None = None) -> str:
    esc = _html.escape(text, quote=False)
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return f'<w:p>{ppr}<w:r><w:t xml:space="preserve">{esc}</w:t></w:r></w:p>'


def markdown_to_docx(markdown_text: str) -> bytes:
    """Markdown → .docx bytes, pure stdlib (zipfile + hand-built OOXML).

    Mirrors the reference's python-docx conversion exactly (app.py:167-183):
    line-based — '# '/'## '/'### ' → Heading1-3, '- '/'* ' → List Bullet,
    blank lines skipped, everything else a plain paragraph. Deterministic
    output (fixed zip timestamps) so the bytes are content-addressable."""
    import io
    import zipfile

    body: list[str] = []
    for line in markdown_text.split("\n"):
        line = line.strip()
        if not line:
            continue
        if line.startswith("# "):
            body.append(_docx_paragraph(line[2:], "Heading1"))
        elif line.startswith("## "):
            body.append(_docx_paragraph(line[3:], "Heading2"))
        elif line.startswith("### "):
            body.append(_docx_paragraph(line[4:], "Heading3"))
        elif line.startswith(("- ", "* ")):
            body.append(_docx_paragraph(line[2:], "ListBullet"))
        else:
            body.append(_docx_paragraph(line))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>' + "".join(body) + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("_rels/.rels", _DOCX_RELS),
            ("word/_rels/document.xml.rels", _DOCX_DOC_RELS),
            ("word/styles.xml", _DOCX_STYLES),
            ("word/document.xml", document),
        ):
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()
