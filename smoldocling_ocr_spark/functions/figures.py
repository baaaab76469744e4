"""Occupancy-grid figure detection.

Reference semantics: /root/reference/structure_engine.py:161-251 — page split
into 50px grid cells, cells covered by text boxes marked occupied, contiguous
empty regions found by 4-neighbour flood fill, regions >= 100px in both
dimensions emitted as figure elements with ``(max+1)*grid``-rounded bboxes.

Re-expressed with numpy for the occupancy rasterization; the flood fill
keeps the exact stack-based traversal and bbox rounding for parity
(SURVEY.md §2.7 parity note).
"""

from __future__ import annotations

from typing import Any

import numpy as np

GRID = 50
MIN_GAP = 100


def detect_figure_regions(
    page_width: float,
    page_height: float,
    text_boxes: list[tuple[float, float, float, float]],
    grid_size: int = GRID,
    min_gap_size: int = MIN_GAP,
) -> list[dict[str, Any]]:
    """Empty-region figure candidates from text-box coverage."""
    if not text_boxes:
        return []
    grid_w = (int(page_width) + grid_size - 1) // grid_size
    grid_h = (int(page_height) + grid_size - 1) // grid_size
    occupancy = np.zeros((grid_h, grid_w), dtype=bool)

    for x0, y0, x1, y1 in text_boxes:
        gy0 = max(0, int(y0) // grid_size)
        gy1 = min(grid_h, (int(y1) + grid_size - 1) // grid_size)
        gx0 = max(0, int(x0) // grid_size)
        gx1 = min(grid_w, (int(x1) + grid_size - 1) // grid_size)
        occupancy[gy0:gy1, gx0:gx1] = True

    visited = np.zeros_like(occupancy)
    regions: list[dict[str, Any]] = []

    def flood(start_y: int, start_x: int) -> tuple[int, int, int, int]:
        stack = [(start_y, start_x)]
        min_x = max_x = start_x
        min_y = max_y = start_y
        while stack:
            y, x = stack.pop()
            if y < 0 or y >= grid_h or x < 0 or x >= grid_w:
                continue
            if visited[y, x] or occupancy[y, x]:
                continue
            visited[y, x] = True
            min_x, max_x = min(min_x, x), max(max_x, x)
            min_y, max_y = min(min_y, y), max(max_y, y)
            stack.extend([(y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)])
        return (min_x * grid_size, min_y * grid_size, (max_x + 1) * grid_size, (max_y + 1) * grid_size)

    for y in range(grid_h):
        for x in range(grid_w):
            if not visited[y, x] and not occupancy[y, x]:
                bbox = flood(y, x)
                width = bbox[2] - bbox[0]
                height = bbox[3] - bbox[1]
                if width >= min_gap_size and height >= min_gap_size:
                    regions.append(
                        {
                            "bbox": bbox,
                            "y": bbox[1],
                            "type": "figure",
                            "content": f"[Figure: {width}x{height}px]",
                            "semantic_role": "figure",
                        }
                    )
    return regions
