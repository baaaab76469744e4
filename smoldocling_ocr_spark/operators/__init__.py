"""Spark DataFrame operators: the fused extraction pipeline, staged element
relations, dedup / similarity-search / text-stats operators, lineage."""
