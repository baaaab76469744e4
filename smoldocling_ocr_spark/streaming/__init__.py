"""Streaming adapter.

The reference is strictly batch (SURVEY.md §2.10 — no watermarks, windows, or
stateful ops exist upstream), so the streaming surface is exactly what the
survey prescribes: the per-document pipeline dropped into ``foreachBatch``
unchanged, since every operator is keyed by url.
"""

from .adapter import extract_stream, start_extract_stream

__all__ = ["extract_stream", "start_extract_stream"]
