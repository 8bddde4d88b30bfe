"""Streaming deduplication with bounded state.

The reference is batch-only (SURVEY §2.7 superset).  Event feeds re-deliver:
at-least-once sources, client retries, backfills replaying a window.  The
batch answer (``dropDuplicates`` over the whole table) is a full-history
shuffle every run; the streaming answer keeps a key-set in the state store
and emits each key's FIRST arrival only.

Unbounded key-sets are the failure mode — a forever-running query whose
state grows with history.  ``dedup_stream`` therefore uses
``dropDuplicatesWithinWatermark``: the watermark bounds how late a
duplicate can arrive, and the store evicts keys older than that horizon, so
state is O(arrival rate x watermark window), not O(history).  A duplicate
farther apart than the watermark window is, by declared contract, a new
event — the same contract every at-least-once source already imposes.

Determinism note: emitting a *surviving row* from a first-arrival dedup is
order-dependent when duplicates differ in payload.  The oracle-stable form
is the KEY SET — ``dedup_keys_stream`` projects the dedup key columns only,
which makes the result a pure function of the data (== batch ``SELECT
DISTINCT``) regardless of micro-batch boundaries or arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(events: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "30 minutes") -> DataFrame:
    """First-arrival-wins streaming dedup over ``keys`` with state bounded
    by the watermark horizon.  Emits full surviving rows (append mode).

    Unlike ``dropDuplicates``, the event-time column must NOT be part of the
    key: ``dropDuplicatesWithinWatermark`` treats rows as duplicates when
    their keys match and their event times fall within the watermark delay
    of each other — which is what lets the store evict old keys."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_keys_stream(events: DataFrame, keys: list[str],
                      ts_key: str,
                      watermark: str = "30 minutes") -> DataFrame:
    """Batch-equivalent streaming dedup: the distinct KEY SET.

    ``keys`` must be existing columns of ``events`` and include ``ts_key``,
    an event-time (timestamp) column — typically a truncated timestamp
    (e.g. minute bucket) that is both part of the dedup identity and the
    watermark carrier.  The key columns are projected FIRST, so duplicate
    rows with differing payloads cannot make the output arrival-order
    dependent: the emitted set equals batch ``SELECT DISTINCT keys`` for
    any terminating input, which is what the oracle checks.
    """
    if ts_key not in keys:
        raise ValueError(f"ts_key {ts_key!r} must be one of keys {keys}")
    proj = events.select(*[F.col(k) for k in keys]).withWatermark(
        ts_key, watermark
    )
    return proj.dropDuplicatesWithinWatermark(keys)
