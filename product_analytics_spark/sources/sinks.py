"""Warehouse sinks: snapshot store with merge/upsert, partitioned
writes, and the ZORDER-analog layout pass.

Reference mapping (SURVEY.md §2.1):
  S4 merge/upsert        dbt incremental_strategy='merge' + unique_key
                         (customers_latest.sql:3-6, orders_cleaned.sql:9-12)
  S5 append              dbt default strategy (dbt_project.yml:40-41)
  S6 partitioned write   partition_by=['order_year','order_month'] /
                         ['country'] (orders_cleaned.sql:14, dim_customer.sql:7)
  S7 ZORDER post-hook    OPTIMIZE ... ZORDER BY (customers_latest.sql:7 etc.)
  S8 schema evolution    on_schema_change='sync_all_columns'

Without delta-spark, MERGE is anti-join + unionByName and the commit
is an atomic write-temp-then-rename swap (a parquet snapshot has no
transaction log, so the swap is the commit point). With delta-spark
installed, ``DeltaTable.merge`` replaces both. The ZORDER analog is
repartitionByRange + sortWithinPartitions: same data-skipping effect
(clustered min/max ranges per file) from OSS primitives.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from product_analytics_spark.operators.incremental import merge_upsert

try:  # delta-spark is optional; everything falls back to parquet.
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    HAVE_DELTA = False


class SnapshotStore:
    """Keyed SCD-1 snapshots in a warehouse directory, one table per
    model, with atomic replace and merge/upsert.

    At 100 TB the same interface maps onto Delta/Iceberg tables: the
    swap becomes a transactional commit and merge becomes MERGE INTO
    with file pruning on the unique key; nothing above this class
    changes.
    """

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def read(self, name: str) -> DataFrame | None:
        """Prior snapshot ({{ this }}) or None on first run."""
        if not self.exists(name):
            return None
        return self.spark.read.parquet(self.path(name))

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: Sequence[str] = (),
        cluster_by: Sequence[str] = (),
    ) -> None:
        """Atomic full replace: write to a temp dir, swap into place.

        ``cluster_by`` is the ZORDER analog (S7): range-partition +
        sort-within-partitions on the cluster keys before writing, so
        parquet min/max stats give data skipping on those columns.

        Partitioned writes first hash-repartition on the partition
        columns so each hive partition directory is written by one
        task (one well-sized file per directory instead of
        tasks x partitions small files), then sort within by the
        cluster keys for row-group stat skipping inside each
        partition.
        """
        if partition_by:
            df = df.repartition(*partition_by).sortWithinPartitions(
                *partition_by, *cluster_by
            )
        elif cluster_by:
            df = df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)
        tmp = self.path(f"_tmp_{name}_{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        final = self.path(name)
        if os.path.isdir(final):
            old = self.path(f"_old_{name}_{uuid.uuid4().hex[:8]}")
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, final)

    def append(self, name: str, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S5: plain append materialization."""
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def merge(
        self,
        name: str,
        batch: DataFrame,
        key: str | Sequence[str],
        partition_by: Sequence[str] = (),
        cluster_by: Sequence[str] = (),
    ) -> DataFrame:
        """S4: MERGE batch into the named snapshot on ``key``;
        returns the merged snapshot DataFrame (freshly readable)."""
        prev = self.read(name)
        merged = merge_upsert(prev, batch, key)
        # Materialize BEFORE the swap: `merged` lazily reads the old
        # files, so compute into the temp dir first (overwrite does).
        self.overwrite(name, merged, partition_by=partition_by, cluster_by=cluster_by)
        return self.spark.read.parquet(self.path(name))
