"""Structured Streaming layer (SURVEY §2.10).

The reference is strictly bounded batch; the engine's event-time window
queries (operators/windows.py) use the exact functions Structured
Streaming uses, so this package upgrades them to ``readStream`` pipelines
without changing semantics.
"""
