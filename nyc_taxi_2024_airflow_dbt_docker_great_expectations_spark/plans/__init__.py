"""The medallion model DAG (bronze -> silver -> gold), trip-schema parity.

Each model is a pure ``DataFrame -> DataFrame`` function; lineage that dbt
tracks via ``ref()`` is plain function composition here, and Catalyst sees the
whole composed plan (so filters written in gold push down through silver into
the bronze scan).
"""

from .bronze import bronze_trips  # noqa: F401
from .silver import silver_trips  # noqa: F401
from .gold import (  # noqa: F401
    gold_daily_summary,
    gold_monthly_summary,
    gold_payment_summary,
    gold_vendor_summary,
    gold_zone_summary,
)
