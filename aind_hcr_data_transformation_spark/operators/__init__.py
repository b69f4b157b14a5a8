"""Operator library.

Each module exports ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (ANSI SQL for the DuckDB differential oracle;
a missing oracle entry means the driver records a weaker rows-only check).
``__spark_entry__.py`` merges all modules.
"""
