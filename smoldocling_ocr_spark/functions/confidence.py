"""Confidence aggregation core.

Reference semantics: /root/reference/confidence_tracker.py — document stats
(avg/min/max/median/stdev, uncertain < 0.7 and low < 0.5 counts/percentages,
:103-144), per-page stats (:146-160), page quality tiers (:241-275), the
overall quality score ``0.6*avg + 0.2*min + 0.2*(1 - uncertain%)`` (:277-306)
and the YAML dict (:308-324).

In the Spark relational twin these are plain groupBy aggregations
(SURVEY.md §2.4); this form feeds the per-document render UDF.
"""

from __future__ import annotations

import statistics
from typing import Any

LOW_THRESHOLD = 0.7
CRITICAL_THRESHOLD = 0.5


def _clamp(value: Any) -> float:
    try:
        conf = float(value) if value is not None else 1.0
    except (TypeError, ValueError):
        conf = 1.0
    return max(0.0, min(1.0, conf))


def collect_scores(pages: list[list[dict[str, Any]]]) -> list[tuple[int, float, str]]:
    """Flatten (page_num, clamped confidence, element type) records."""
    records = []
    for page_num, elements in enumerate(pages, 1):
        for elem in elements:
            records.append((page_num, _clamp(elem.get("confidence", 1.0)), elem.get("type", "text")))
    return records


def document_statistics(pages: list[list[dict[str, Any]]]) -> dict[str, Any]:
    records = collect_scores(pages)
    if not records:
        return {
            "avg": 1.0, "min": 1.0, "max": 1.0, "median": 1.0, "std_dev": 0.0,
            "total_elements": 0, "uncertain_count": 0, "uncertain_percentage": 0.0,
            "low_confidence_count": 0, "low_confidence_percentage": 0.0,
        }
    scores = [r[1] for r in records]
    uncertain = sum(1 for s in scores if s < LOW_THRESHOLD)
    low = sum(1 for s in scores if s < CRITICAL_THRESHOLD)
    return {
        "avg": round(statistics.mean(scores), 4),
        "min": round(min(scores), 4),
        "max": round(max(scores), 4),
        "median": round(statistics.median(scores), 4),
        "std_dev": round(statistics.stdev(scores), 4) if len(scores) > 1 else 0.0,
        "total_elements": len(scores),
        "uncertain_count": uncertain,
        "uncertain_percentage": round(uncertain / len(scores) * 100, 2),
        "low_confidence_count": low,
        "low_confidence_percentage": round(low / len(scores) * 100, 2),
    }


def quality_tier(avg_conf: float) -> str:
    if avg_conf >= 0.9:
        return "excellent"
    if avg_conf >= 0.8:
        return "good"
    if avg_conf >= 0.7:
        return "acceptable"
    if avg_conf >= 0.5:
        return "poor"
    return "very_poor"


def overall_quality_score(stats: dict[str, Any]) -> float:
    """Weighted 0.6*avg + 0.2*min + 0.2*(1 - uncertain%), clamped to [0,1]."""
    if stats["total_elements"] == 0:
        return 1.0
    quality = (
        0.6 * stats["avg"]
        + 0.2 * stats["min"]
        + 0.2 * (1.0 - stats["uncertain_percentage"] / 100.0)
    )
    return round(max(0.0, min(1.0, quality)), 4)


def to_frontmatter_fields(pages: list[list[dict[str, Any]]]) -> dict[str, Any]:
    stats = document_statistics(pages)
    return {
        "confidence_score": overall_quality_score(stats),
        "confidence_avg": stats["avg"],
        "confidence_min": stats["min"],
        "uncertain_regions": stats["uncertain_count"],
        "uncertain_percentage": stats["uncertain_percentage"],
        "low_confidence_regions": stats["low_confidence_count"],
    }
