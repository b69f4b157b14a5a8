"""Pure planning functions (no Spark dependency): block/chunk geometry,
jump generation, round-robin partitioning. The reference's physical-layout
heuristics (SURVEY §4 X2/X3) as testable pure code.
"""
