"""Cache lifecycle registry.

Operators that self-join an expensive intermediate (MinHash signatures,
SimHash chunks, shingle relations) persist it so the join branches
share one computation pass. ``persist()`` here registers every such
relation so runners can release them: a long-lived SparkSession that
sweeps many queries (the driver's correctness sweep, bench.py,
tools/check.py) calls :func:`clear_all` between queries, instead of
accumulating cached relations in executor memory for the whole sweep
(the round-1 leak). At 100 TB the same intermediates would be written
to a signatures *table* and reused across runs — the registry is the
in-session analog of that lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """Persist (memory-and-disk, spill-safe) and register for cleanup."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(out)
    return out


def clear_all() -> int:
    """Unpersist every registered relation; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
