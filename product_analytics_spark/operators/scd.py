"""Slowly-changing-dimension (SCD Type 2) history builder.

The reference project ships an (empty) dbt ``snapshots/`` directory —
dbt's snapshot materialization is the workflow's history mechanism
(public dbt-core semantics: ``strategy: check`` emits a new version
row whenever a tracked column's value changes, with
``dbt_valid_from``/``dbt_valid_to`` bounds and NULL valid_to marking
the current row). This module provides that surface as a batch
operator over an event/CDC history.

Spark mapping — two window passes over ONE shuffle:

1. change-point detection: ``lag(tracked) OVER (PARTITION BY key
   ORDER BY ts, tiebreak)``; a row opens a new version iff it is the
   first for its key or any tracked value differs from the previous
   row (NULL-safe ``<=>`` comparison, matching dbt's column-compare);
2. interval assembly over the surviving change points:
   ``valid_from = ts``, ``valid_to = lead(ts)``, ``is_current =
   valid_to IS NULL``.

Both windows partition on the same key, so Catalyst reuses a single
hash-partitioned exchange (verified in tests/test_plans.py).

Scale notes (100 TB): the shuffle moves |history| rows once; state
per task is one window frame (streaming aggregation, no
materialized-per-key buffers). Skewed keys (one entity with millions
of updates) are bounded by the window's spill-to-disk sort, and the
change-point filter typically collapses the history by orders of
magnitude before the second window's lead() — which is why detection
runs FIRST. For continuous maintenance, pair with
``streaming.ops``'s CDC dedup + ``foreachBatch`` merge into the
snapshot store (sources/sinks.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    tracked_cols: str | Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change history into SCD2 version intervals.

    Returns one row per (key, version) with all original columns of
    the version-opening row plus ``valid_from``, ``valid_to`` and
    ``is_current``. ``tiebreak_cols`` deterministically orders rows
    sharing (key, ts) — pass a unique id column.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tracked = [tracked_cols] if isinstance(tracked_cols, str) else list(tracked_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)

    # A row opens a new version iff any tracked column differs from
    # the previous row for the same key. eqNullSafe mirrors dbt's
    # check-strategy column comparison (NULL==NULL holds).
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    is_first = F.row_number().over(w) == F.lit(1)

    points = df.withColumn("_open", is_first | changed).filter(F.col("_open")).drop("_open")

    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        points.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
