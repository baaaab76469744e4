"""Pure-Python deterministic core.

Every function here is referentially transparent and safe to call inside
Arrow-batched pandas UDFs (module-level compiled regexes → compiled once per
executor python worker). Python ``re`` semantics are kept deliberately —
Java regex differs on ``\\w`` / multiline ``^`` — so byte parity with the
golden fixtures is guaranteed regardless of which Spark stage invokes them
(SURVEY.md §4.2 "parity traps").
"""
