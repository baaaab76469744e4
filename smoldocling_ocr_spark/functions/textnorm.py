"""Text normalization core (hyphen merge, markdown normalize, defragment).

Reference semantics: /root/reference/cleaner.py:5-13 (strict hyphen merge),
noise_filter.py:302-310 (loose hyphen merge), cleaner.py:214-269
(normalize_markdown 6-step chain), cleaner.py:179-211 (defragment),
noise_filter.py:313-331 (clean_ocr_artifacts). Both hyphen-merge variants are
deliberately preserved: the enhanced render path uses the loose variant
(enhanced_pipeline.py:159), the legacy digital path the strict one
(structure_engine.py:544).
"""

from __future__ import annotations

import re

# strict: continuation must be lowercase letters (cleaner.py:12)
# Possessive quantifiers (3.11+) are semantically identical here — the char
# after a greedy \w+/[a-zA-Z]+ run is never a word char, so backtracking the
# group can never produce a match the possessive form misses — but they stop
# the engine re-trying every prefix of every word in the document (measured
# ~7% of the whole per-doc extraction cost on the loose variant).
_HYPHEN_STRICT = re.compile(r"([a-zA-Z]++)-\s*\n\s*+([a-z]++)")
# loose: any word chars on both sides (noise_filter.py:309)
_HYPHEN_LOOSE = re.compile(r"(\w++)-\s*\n\s*+(\w++)")
# candidate prefilter for both variants: every match contains '-' + optional
# spaces + newline. This pattern STARTS with the literal '-', so the regex
# engine memchr-skips to each hyphen instead of attempting \w++ at every
# position of the document (the \w-leading patterns admit no fast skip —
# measured ~0.24 ms/doc of pure scan on hyphen-free bodies). Exact
# semantics: when no candidate exists the sub is the identity, and when one
# does the ORIGINAL pattern does the whole job (including its chained
# "a-\nb-\nc" → "ab-\nc" continuation behavior, which a lookaround rewrite
# would change).
_HYPHEN_CAND = re.compile(r"-\s*\n")

_UNICODE_DASHES = {
    "−": "-",  # minus sign
    "–": "-",  # en dash
    "—": "-",  # em dash
    "―": "-",  # horizontal bar
}

_LIST_INDENT = re.compile(r"(^|\n\n)[ ]{2,4}([-*+])\s", re.MULTILINE)
_MULTI_NEWLINE = re.compile(r"\n{3,}")
_STAR_BULLET = re.compile(r"^(\s*)\* ", re.MULTILINE)
_HEADING_BLANK = re.compile(r"([^\n])\n(#{1,6} )")
_EMPTY_ROLE_TAG = re.compile(r"<!-- role:\w+ -->\s*<!-- /role -->")

_ARTIFACT_LINE_START = re.compile(r"^[|_\-=+]+\s*", re.MULTILINE)
_MULTI_SPACE = re.compile(r"[ \t]{2,}")
_BLANK_RUNS = re.compile(r"\n\s*\n{2,}")

_WORD_NUM = re.compile(r"\b\d+\b")


def merge_hyphenated_words_strict(text: str) -> str:
    """Join words split by an end-of-line hyphen; continuation must be lowercase."""
    if _HYPHEN_CAND.search(text) is None:
        return text
    return _HYPHEN_STRICT.sub(r"\1\2", text)


def merge_hyphenated_words_loose(text: str) -> str:
    """Join any word broken by hyphen+newline (``docu-\\nment`` → ``document``)."""
    if _HYPHEN_CAND.search(text) is None:
        return text
    return _HYPHEN_LOOSE.sub(r"\1\2", text)


def normalize_markdown(text: str) -> str:
    """Six-step markdown normalization chain (cleaner.py:214-269 semantics).

    1. unicode dashes → ``-``; 2. strip 2-4-space indent before top-level
    bullets; 3. collapse 3+ newlines to 2; 4. ``*`` bullets → ``-``;
    5. blank line before headings; 6. drop empty role tags; final strip.
    """
    if not text:
        return ""
    for dash, repl in _UNICODE_DASHES.items():
        text = text.replace(dash, repl)
    text = _LIST_INDENT.sub(r"\1\2 ", text)
    text = _MULTI_NEWLINE.sub("\n\n", text)
    text = _STAR_BULLET.sub(r"\1- ", text)
    text = _HEADING_BLANK.sub(r"\1\n\n\2", text)
    text = _EMPTY_ROLE_TAG.sub("", text)
    return text.strip()


def defragment_text(text: str) -> str:
    """Merge lines not ending in sentence punctuation into one paragraph line.

    Blank lines are kept as paragraph breaks (cleaner.py:179-211 semantics).
    """
    out: list[str] = []
    pending = ""
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            if pending:
                out.append(pending)
                pending = ""
            out.append("")
            continue
        if not pending:
            pending = line
        elif pending.endswith((".", "?", "!", ":")):
            out.append(pending)
            pending = line
        else:
            pending += " " + line
    if pending:
        out.append(pending)
    return "\n".join(out)


def clean_ocr_artifacts(text: str) -> str:
    """Strip stray line-leading special chars, collapse spaces and blank runs."""
    text = _ARTIFACT_LINE_START.sub("", text)
    text = _MULTI_SPACE.sub(" ", text)
    text = _BLANK_RUNS.sub("\n\n", text)
    return text.strip()


def normalize_for_repeater(text: str) -> str:
    """Lowercase + whitespace-collapse normalization (cleaner.py:95)."""
    return " ".join(text.lower().split())


def mask_numbers(text: str) -> str:
    """Replace standalone digit runs with ``[NUM]`` (noise_filter.py:192-196)."""
    return _WORD_NUM.sub("[NUM]", text.strip())
