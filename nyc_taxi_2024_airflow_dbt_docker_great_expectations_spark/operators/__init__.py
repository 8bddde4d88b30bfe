"""Generic relational primitives (SURVEY.md sections 2.1, 2.3, 2.5).

These are the engine-level building blocks the plans/ models compose:
incremental merge strategies, DISTINCT ON dedup, watermark filters.
"""

from .merge import merge_on_key, upsert_by_key, append_if_absent  # noqa: F401
from .dedup import distinct_on  # noqa: F401
from .watermark import (  # noqa: F401
    max_scalar,
    watermark_filter,
    watermark_filter_month_reopen,
)
