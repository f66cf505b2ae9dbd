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

import threading

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


# --- Cross-query shared relations -----------------------------------
#
# Some intermediates are shared by SEVERAL queries in a sweep (the
# co-purchase edge list feeds both the triangle counts and the BFS).
# At 100 TB those are materialized tables built once per ingest and
# read by every consumer; the in-session analog is a keyed memo that
# SURVIVES clear_all() and is only dropped by clear_shared(). Entries
# are keyed internally by (applicationId, key) — callers pass a plain
# name+sf_dir key and can never hand one session a plan cached under a
# previous, stopped session; entries from dead sessions are pruned on
# the next miss (round-6 verdict: the appId discipline was caller
# convention before, and nothing ever evicted dead-session entries).

_SHARED: dict[tuple[str, str], DataFrame] = {}
#: bench.py drives QUERIES through 8 worker threads; the miss path
#: (stale-entry eviction + build + insert) must be serialized or two
#: concurrent misses pop the same stale key (KeyError) and double-build
#: the same relation (two persisted copies, one leaked).
_SHARED_LOCK = threading.Lock()


def _current_app_id() -> str:
    """applicationId of the live session (thread-local active session
    first; the process default otherwise — getOrCreate never builds a
    new one while a default exists, e.g. in bench worker threads)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    return spark.sparkContext.applicationId


def persist_shared(key: str, build) -> DataFrame:
    """Return the memoized persisted relation for ``key``, building it
    with ``build()`` (a zero-arg callable) on first use. Keys are
    scoped to the live session's applicationId internally; a miss also
    evicts (best-effort unpersists) entries left by stopped sessions."""
    app_id = _current_app_id()
    full = (app_id, key)
    df = _SHARED.get(full)
    if df is None:
        with _SHARED_LOCK:
            df = _SHARED.get(full)  # double-checked: a racer may have built
            if df is None:
                for stale_key in [k for k in _SHARED if k[0] != app_id]:
                    stale = _SHARED.pop(stale_key, None)
                    if stale is None:
                        continue
                    try:
                        stale.unpersist(False)
                    except Exception:  # noqa: BLE001 — session already gone
                        pass
                df = build().persist(StorageLevel.MEMORY_AND_DISK)
                _SHARED[full] = df
    return df


def clear_shared() -> int:
    """Unpersist every shared relation; returns how many."""
    n = 0
    with _SHARED_LOCK:
        for df in list(_SHARED.values()):
            try:
                df.unpersist(False)
                n += 1
            except Exception:  # noqa: BLE001
                pass
        _SHARED.clear()
    return n
