"""Scalar-function library (SURVEY.md section 2.6, F1-F17).

Everything here is built-in ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen friendly, zero Python UDFs (the reference's data plane has
none either, SURVEY section 2.8).
"""

from .decode import (  # noqa: F401
    PAYMENT_MAP,
    RATECODE_MAP,
    VENDOR_MAP,
    decode_map,
    decode_via_broadcast_join,
    dim_from_map,
)
from .datetime import (  # noqa: F401
    duration_minutes,
    month_key,
    month_start,
    next_month,
    to_day,
)
from .money import (  # noqa: F401
    abs_coalesce_zero,
    exact_avg,
    exact_sum,
    guarded_ratio,
    row_total,
)
from .keys import surrogate_key  # noqa: F401
