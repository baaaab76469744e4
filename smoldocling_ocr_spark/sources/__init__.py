"""Table readers and deterministic corpus synthesis."""
