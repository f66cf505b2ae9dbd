"""Data-quality validations — the dbt generic-test surface.

The reference repo declares no tests, but every dbt deployment runs
`dbt test`, whose four built-in generic tests (not_null, unique,
accepted_values, relationships — public dbt-core semantics) are part
of the workflow a reference user would bring to this engine. Each
check returns the VIOLATION set (dbt's convention: a test passes when
the query returns zero rows); :func:`quality_report` aggregates many
checks into one small (check, n_violations) relation.

Scale notes:
- every check is a filter/aggregate/anti-join over built-ins — no
  collects, no UDFs; violations are counted distributed and only the
  per-check scalar row comes back;
- `unique` is a hash-agg on the key (shuffles |keys| after map-side
  partial counts); `relationships` is an anti-join that broadcasts
  the parent side when it is dimension-sized (AQE decides);
- checks compose into ONE job per table when unioned through
  :func:`quality_report` — the driver sees a single small result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null_violations(df: DataFrame, col: str) -> DataFrame:
    """Rows where ``col`` IS NULL (dbt ``not_null``)."""
    return df.filter(F.col(col).isNull())


def unique_violations(df: DataFrame, cols: str | Sequence[str]) -> DataFrame:
    """Key values appearing more than once (dbt ``unique``); returns
    one row per duplicated key with its count."""
    key = [cols] if isinstance(cols, str) else list(cols)
    return (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def accepted_values_violations(
    df: DataFrame, col: str, values: Sequence[str]
) -> DataFrame:
    """Rows whose ``col`` is outside the accepted set (dbt
    ``accepted_values``; NULLs are not violations — pair with
    not_null)."""
    c = F.col(col)
    return df.filter(c.isNotNull() & ~c.isin(*values))


def relationships_violations(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Child rows whose FK has no parent row (dbt ``relationships``);
    NULL FKs are not violations (dbt semantics). Anti-join — the
    parent side broadcasts when dimension-sized."""
    p = parent.select(F.col(parent_col).alias("__pk")).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(p, F.col(child_col) == F.col("__pk"), "left_anti")
    )


def quality_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Union of per-check violation counts: (check, n_violations).

    ``checks`` maps a check name to its violation DataFrame. Each
    branch reduces to one row before the union, so the result is
    |checks| rows regardless of table size.
    """
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check"), "n_violations"
        )
        for name, df in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
