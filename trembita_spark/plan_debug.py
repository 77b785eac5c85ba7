"""Test-only capture of pre-checkpoint lineage for plan audits.

The two-phase prefix machinery (``operators/ranking.py`` prefix_sum_multi,
``pipeline.py`` zip_with_index) ends its first phase in a LAZY
``localCheckpoint`` — required for correctness: the frame is consumed by
two branches, and without the barrier AQE can coalesce the range exchange
DIFFERENTLY per branch, misaligning the ``__pid`` spaces (caught at the 8x
replica, r12 extras2 sweep). The barrier truncates the visible SQL plan to
a ``Scan ExistingRDD``, so the plan audits in ``tests/test_plans.py`` that
pin the phase-1 shape (data rides a rangepartitioning exchange,
``__pid``-partitioned local windows, no single-partition data window) can
no longer see it from the consumer's ``explain``.

This hook lets the audits inspect exactly what production executes: when
``ENABLED``, the prefix machinery appends the pre-checkpoint DataFrame
(whose plan IS the plan the barrier materializes) to ``CAPTURED`` just
before checkpointing. Off by default — production keeps no references.
"""

from __future__ import annotations

ENABLED = False
CAPTURED: list = []


def capture(df):
    """Record ``df`` for plan inspection when enabled; always returns it."""
    if ENABLED:
        CAPTURED.append(df)
    return df
