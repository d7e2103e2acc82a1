"""Oracle-SQL helpers shared by query modules."""

from __future__ import annotations


def dlit(x: float) -> str:
    """A DuckDB/Spark SQL literal that parses as the exact float64 ``x``.

    Bare decimal literals are typed DECIMAL by DuckDB and double-rounded on
    cast; scientific notation parses directly (correctly rounded) to
    DOUBLE. repr() gives the shortest round-tripping decimal string.
    """
    s = repr(float(x))
    if "e" in s or "E" in s or "inf" in s or "nan" in s:
        return s
    return s + "e0"
