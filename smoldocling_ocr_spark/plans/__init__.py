"""Query catalog: Spark DataFrame queries and their DuckDB oracle twins."""
