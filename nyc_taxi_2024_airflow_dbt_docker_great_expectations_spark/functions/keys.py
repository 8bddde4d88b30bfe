"""Surrogate-key derivation (reference F8).

The reference builds ``unique_trip_id`` as
``md5(COALESCE(CAST(col AS VARCHAR), default) || COALESCE(...) || ...)``
— bare concatenation, sentinel defaults ``'-1'`` / ``'1900-01-01'`` / ``'0'``
— over 7 columns (``dbt/nyc_taxi/models/silver/silver_yellow_tripdata.sql:72-80``).

Cast-formatting parity (SURVEY section 7.4): Postgres and Spark agree on
``1.5 -> '1.5'`` but integer-valued doubles render ``'2'`` vs ``'2.0'``.  To
make the hash deterministic *and* portable this implementation formats each
input explicitly: timestamps via ``date_format`` with an explicit pattern,
everything else via plain string cast.  The same normalization must be used by
any oracle recomputing the key.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss"


def surrogate_key(
    cols: list[Column | str],
    defaults: list[str] | None = None,
    sep: str = "-",
    timestamp_cols: set[str] | None = None,
) -> Column:
    """md5 over the ``sep``-joined normalized string renderings of ``cols``.

    ``defaults`` supplies the per-column COALESCE fallback string (the
    reference uses sentinels ``'-1'`` / ``'1900-01-01'`` / ``'0'`` and
    joins with bare concatenation, i.e. ``sep=""``).
    """
    parts: list[Column] = []
    for i, col in enumerate(cols):
        c = F.col(col) if isinstance(col, str) else col
        if timestamp_cols and isinstance(col, str) and col in timestamp_cols:
            rendered = F.date_format(c, TIMESTAMP_FORMAT)
        else:
            rendered = c.cast("string")
        default = defaults[i] if defaults else "null"
        parts.append(F.coalesce(rendered, F.lit(default)))
    return F.md5(F.concat_ws(sep, *parts))
