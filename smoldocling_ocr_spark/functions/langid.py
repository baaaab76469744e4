"""Language identification core (script histogram + common-word overlap).

Reference semantics: /root/reference/language_detector.py — unicode script
ranges (:13-27), Latin common-word sets (:30-41), script→language map
(:44-54), CJK disambiguation via kana/hangul counts > 5 (:159-169), Latin
confidence ``min(1, matches/|words| * 5)`` (:135-157), >= 10 chars required
(:89), first-5-pages sample for batch detection (:179-193).
"""

from __future__ import annotations

import re
from collections import Counter

SCRIPT_RANGES = {
    "latin": (0x0000, 0x024F),
    "cyrillic": (0x0400, 0x04FF),
    "arabic": (0x0600, 0x06FF),
    "devanagari": (0x0900, 0x097F),
    "bengali": (0x0980, 0x09FF),
    "myanmar": (0x1000, 0x109F),
    "thai": (0x0E00, 0x0E7F),
    "cjk": (0x4E00, 0x9FFF),
    "hangul": (0xAC00, 0xD7AF),
    "hiragana": (0x3040, 0x309F),
    "katakana": (0x30A0, 0x30FF),
    "greek": (0x0370, 0x03FF),
    "hebrew": (0x0590, 0x05FF),
}

COMMON_WORDS = {
    "en": {"the", "and", "is", "in", "to", "of", "a", "for", "that", "it", "with", "as", "was", "be"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf", "für"},
    "fr": {"le", "la", "les", "de", "un", "une", "et", "est", "en", "que", "des", "du", "qui", "dans"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "se", "los", "las", "con", "por"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "in", "è", "per", "non", "con", "del", "si"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "uma", "para", "é", "com", "não"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "op", "te", "dat", "die", "voor", "met"},
    "id": {"yang", "dan", "di", "untuk", "dengan", "dari", "ini", "itu", "ke", "dalam", "adalah"},
    "tr": {"bir", "ve", "bu", "için", "ile", "de", "da", "olarak", "olan", "var", "kadar", "gibi"},
    "vi": {"và", "của", "là", "có", "trong", "được", "cho", "với", "này", "các", "những", "đã"},
}

SCRIPT_LANGUAGES = {
    "cyrillic": "ru",
    "arabic": "ar",
    "devanagari": "hi",
    "bengali": "bn",
    "myanmar": "my",
    "thai": "th",
    "hangul": "ko",
    "hebrew": "he",
    "greek": "el",
}

_LATIN_WORD = re.compile(r"\b[a-zA-Z]+\b")
DEFAULT_LANGUAGE = "en"

# One compiled character-class per script: counting runs at C speed instead
# of a per-character Python loop (ranges are disjoint, so per-script regex
# counts equal the reference's first-match-wins histogram).
_LETTER_RE = re.compile(r"[^\W\d_]")  # unicode letters (== str.isalpha here)
# a letter that is NOT ASCII — one search decides whether the histogram can
# be anything other than {latin: n} without materializing the letters string
_NONASCII_LETTER_RE = re.compile(r"(?![\x00-\x7f])[^\W\d_]")
_SCRIPT_RES = {
    script: re.compile(f"[{chr(start)}-{chr(end)}]")
    for script, (start, end) in SCRIPT_RANGES.items()
}


def detect_script(text: str) -> tuple[str, float]:
    # ASCII fast path: every ASCII letter falls in the latin range
    # (0x0000–0x024F), so the histogram is {latin: n} and conf is exactly
    # n/n = 1.0 — equivalent to the full scan, one findall instead of ~11
    if text.isascii():
        if _LETTER_RE.search(text) is None:
            return "unknown", 0.0
        return "latin", 1.0
    # second fast path: pages whose only non-ASCII chars are punctuation
    # (unicode dashes/quotes are everywhere in web text) still have all-
    # ASCII LETTERS — histogram is {latin: n}, conf 1.0, same as full scan.
    # One search replaces materializing the letters string for this case.
    if _NONASCII_LETTER_RE.search(text) is None:
        if _LETTER_RE.search(text) is None:
            return "unknown", 0.0
        return "latin", 1.0
    letters = "".join(_LETTER_RE.findall(text))
    counts: Counter[str] = Counter()
    for script, pattern in _SCRIPT_RES.items():
        n = len(pattern.findall(letters))
        if n:
            counts[script] = n
    if not counts:
        return "unknown", 0.0
    script, count = counts.most_common(1)[0]
    return script, count / len(letters)


def detect_latin_language(text: str) -> tuple[str, float]:
    words = _LATIN_WORD.findall(text.lower())
    if not words:
        return DEFAULT_LANGUAGE, 0.0
    word_set = set(words)
    scores = {lang: len(word_set & common) for lang, common in COMMON_WORDS.items()}
    if max(scores.values()) == 0:
        return DEFAULT_LANGUAGE, 0.0
    best = max(scores, key=lambda k: scores[k])
    confidence = min(1.0, scores[best] / len(word_set) * 5)
    return best, confidence


def detect_cjk(text: str) -> str:
    hiragana = sum(1 for c in text if 0x3040 <= ord(c) <= 0x309F)
    katakana = sum(1 for c in text if 0x30A0 <= ord(c) <= 0x30FF)
    hangul = sum(1 for c in text if 0xAC00 <= ord(c) <= 0xD7AF)
    if hiragana + katakana > 5:
        return "ja"
    if hangul > 5:
        return "ko"
    return "zh"


def detect_language(text: str) -> dict[str, object]:
    """Full detection → {'language','confidence','script','method'}."""
    if not text or len(text.strip()) < 10:
        return {"language": DEFAULT_LANGUAGE, "confidence": 0.0, "script": "unknown", "method": "insufficient_text"}
    script, script_conf = detect_script(text)
    if script != "latin" and script in SCRIPT_LANGUAGES:
        return {"language": SCRIPT_LANGUAGES[script], "confidence": round(script_conf, 4), "script": script, "method": "script"}
    if script == "cjk":
        return {"language": detect_cjk(text), "confidence": round(script_conf, 4), "script": "cjk", "method": "cjk_analysis"}
    if script in ("hiragana", "katakana"):
        return {"language": "ja", "confidence": round(script_conf, 4), "script": script, "method": "script"}
    if script == "latin":
        lang, word_conf = detect_latin_language(text)
        return {"language": lang, "confidence": round(word_conf, 4), "script": "latin", "method": "word_frequency"}
    return {"language": DEFAULT_LANGUAGE, "confidence": 0.0, "script": script, "method": "fallback"}


def detect_language_pages(pages: list[str]) -> dict[str, object]:
    """Batch detection over the first 5 pages (language_detector.py:192)."""
    if not pages:
        return {"language": DEFAULT_LANGUAGE, "confidence": 0.0, "script": "unknown", "method": "no_pages"}
    return detect_language(" ".join(pages[:5]))
