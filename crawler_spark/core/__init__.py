"""Pure-Python kernel — NO Spark imports here.

Shared by the single-threaded oracle simulator (tests/goldens) and the
deterministic fixture generators. Everything is a pure function of its
inputs so goldens are byte-reproducible.
"""
