"""Sinks: chunked compressed array stores and tabular outputs (SURVEY §2.2)."""
