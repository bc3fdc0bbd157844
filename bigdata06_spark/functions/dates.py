"""Ragged release-date normalization (SURVEY.md §7 hard part).

Spotify returns `release_date` at ragged precision — `YYYY`, `YYYY-MM`,
or `YYYY-MM-DD` (observed at Spotify_API.py:105) — and the reference
carries it as an untyped string. The engine normalizes to a proper
DateType (conventional fill: Jan/1st for missing parts) plus a kept
precision tag so downstream code can distinguish "1999" from
"1999-01-01".

Pure expression composition — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_YYYY = r"^\d{4}$"
_YYYY_MM = r"^\d{4}-\d{2}$"
_YYYY_MM_DD = r"^\d{4}-\d{2}-\d{2}$"


def release_date_precision(col) -> Column:
    """'year' | 'month' | 'day' | NULL for unparseable/empty."""
    c = col if isinstance(col, Column) else F.col(col)
    return (
        F.when(c.rlike(_YYYY), F.lit("year"))
        .when(c.rlike(_YYYY_MM), F.lit("month"))
        .when(c.rlike(_YYYY_MM_DD), F.lit("day"))
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_release_date(col) -> Column:
    """Ragged string → DateType. YYYY → YYYY-01-01; YYYY-MM → YYYY-MM-01;
    invalid/empty → NULL (to_date with explicit format returns NULL on
    mismatch rather than erroring under ANSI off; we pre-normalize so the
    format is always yyyy-MM-dd)."""
    c = col if isinstance(col, Column) else F.col(col)
    normalized = (
        F.when(c.rlike(_YYYY), F.concat(c, F.lit("-01-01")))
        .when(c.rlike(_YYYY_MM), F.concat(c, F.lit("-01")))
        .when(c.rlike(_YYYY_MM_DD), c)
        .otherwise(F.lit(None).cast("string"))
    )
    return F.to_date(normalized, "yyyy-MM-dd")
