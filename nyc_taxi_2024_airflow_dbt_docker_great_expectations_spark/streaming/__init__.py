"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md section 2.7) — its "incremental"
is watermark-predicated re-runs.  This package is the capability superset:
the monthly load as a ``trigger(availableNow=True)`` stream, plus event-time
tumbling windows and sessionization over the ``events`` stream table.
"""

from .windows import sessionize_batch, tumbling_counts_batch  # noqa: F401
