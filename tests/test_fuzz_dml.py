"""Seeded DML-interleaving fuzzer (round-8 verdict item 8): random
sequences of merge / delete_where / update_where / compact against a
SnapshotStore table — including OCC conflicts injected mid-DML via the
post_scan hook — replayed as plain sequential SQL in DuckDB. The
store's committed state must match the serial replay row-for-row
after EVERY operation: any divergence is a conformance bug (lost
update, resurrection, partial rewrite), pinned by (seed, run, step).

Round 9 adds the merge-on-read DML pair to the op mix: delete_mor /
update_mor (deletion vectors) interleave with everything else, so the
fuzzer probes DV layering, the purge-before-raw-rewrite guard
(compact/optimize/COW-DML over a DV'd table), and mixed MoR/CoW
histories — the same SQL replay stays the truth.

Serial order under an injected conflict: the concurrent merge commits
FIRST, the interrupted DML retries and commits SECOND — so the replay
applies merge, then the DML. That this matches is exactly the OCC
contract q413 certifies, here probed across random histories.

All generated values/predicates live in the dialect-shared integer
subset (no floats across rows) so any mismatch is semantic."""

from __future__ import annotations

import random

import duckdb
import pytest

from product_analytics_spark.sources.sinks import SnapshotStore

SEED = 20260815
N_RUNS = 4
N_OPS = 8
KEYSPACE = 120


def _spark_rows(store, name):
    return sorted(
        tuple(r) for r in store.read(name).select("k", "grp", "v").collect()
    )


def _duck_rows(con):
    return sorted(tuple(r) for r in con.execute("SELECT k, grp, v FROM t").fetchall())


def _batch(rng):
    ks = rng.sample(range(KEYSPACE + 20), rng.randint(1, 12))
    return [(k, f"g{k % 4}", rng.randint(-500, 500)) for k in sorted(ks)]


def _pred(rng):
    return rng.choice(
        [
            f"k % {rng.randint(2, 5)} = {rng.randint(0, 1)}",
            f"v > {rng.randint(-200, 400)}",
            f"grp = 'g{rng.randint(0, 3)}'",
            f"k BETWEEN {rng.randint(0, 40)} AND {rng.randint(50, 139)}",
            f"grp = 'g{rng.randint(0, 3)}' AND v < {rng.randint(-100, 300)}",
        ]
    )


@pytest.mark.parametrize("partitioned", [False, True])
def test_fuzz_dml_interleavings(spark, tmp_path, partitioned):
    rng = random.Random(SEED + int(partitioned))
    failures = []
    for run in range(N_RUNS):
        store = SnapshotStore(
            spark,
            str(tmp_path / f"wh_{partitioned}_{run}"),
            retain_versions=2,
        )
        init = [(k, f"g{k % 4}", k * 3 - 100) for k in range(KEYSPACE)]
        df = spark.createDataFrame(init, "k long, grp string, v long")
        part = ["grp"] if partitioned else []
        # declare clustering so the optimize op exercises the recluster
        # path (layout-only: must never change logical content)
        store.overwrite("t", df, partition_by=part, cluster_by=["v"])

        con = duckdb.connect()
        con.execute("CREATE TABLE t (k BIGINT, grp VARCHAR, v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", init)

        def replay_merge(batch):
            con.executemany(
                "DELETE FROM t WHERE k = ?", [(b[0],) for b in batch]
            )
            con.executemany("INSERT INTO t VALUES (?, ?, ?)", batch)

        def spark_merge(batch):
            store.merge(
                "t",
                spark.createDataFrame(batch, "k long, grp string, v long"),
                "k",
                partition_by=part,
            )

        for step in range(N_OPS):
            op = rng.choice(
                ["merge", "delete", "update", "compact", "optimize",
                 "delete_conflict", "update_conflict",
                 "delete_mor", "update_mor"]
            )
            if op == "merge":
                b = _batch(rng)
                spark_merge(b)
                replay_merge(b)
            elif op == "delete":
                p = _pred(rng)
                store.delete_where("t", p)
                con.execute(f"DELETE FROM t WHERE {p}")
            elif op == "update":
                p, d = _pred(rng), rng.randint(-50, 50)
                store.update_where("t", p, {"v": f"v + {d}"})
                con.execute(f"UPDATE t SET v = v + {d} WHERE {p}")
            elif op == "delete_mor":
                p = _pred(rng)
                store.delete_where_mor("t", p)
                con.execute(f"DELETE FROM t WHERE {p}")
            elif op == "update_mor":
                p, d = _pred(rng), rng.randint(-50, 50)
                store.update_where_mor("t", p, {"v": f"v + {d}"})
                con.execute(f"UPDATE t SET v = v + {d} WHERE {p}")
            elif op == "compact":
                store.compact("t")  # layout-only: no replay
            elif op == "optimize":
                store.optimize("t")  # recluster: layout-only, no replay
            else:
                # OCC interleave: a merge lands inside the DML's
                # scan->commit window; serial history = merge, then DML
                p, b = _pred(rng), _batch(rng)
                fired = {"n": 0}

                def hook():
                    fired["n"] += 1
                    if fired["n"] == 1:
                        spark_merge(b)

                if op == "delete_conflict":
                    store.delete_where("t", p, post_scan=hook)
                    replay_merge(b)
                    con.execute(f"DELETE FROM t WHERE {p}")
                else:
                    d = rng.randint(-50, 50)
                    store.update_where(
                        "t", p, {"v": f"v + {d}"}, post_scan=hook
                    )
                    replay_merge(b)
                    con.execute(f"UPDATE t SET v = v + {d} WHERE {p}")
                assert fired["n"] >= 2, "conflict was not exercised"
            got, want = _spark_rows(store, "t"), _duck_rows(con)
            if got != want:
                diff = [
                    (a, b) for a, b in zip(got, want) if a != b
                ][:3]
                failures.append(
                    f"run {run} step {step} op {op}: {len(got)} vs "
                    f"{len(want)} rows, first diffs {diff}"
                )
                break
        con.close()
    assert not failures, failures
