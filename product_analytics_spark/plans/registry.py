"""Model registry + topological runner — the dbt-DAG analog.

The reference's execution model (SURVEY.md §3): dbt parses ref()/
source() into a DAG, topo-sorts, and runs each model as
(compile -> MERGE into target). Here a :class:`Model` declares its
name, dependencies, materialization, and a builder function
``(catalog_of_dep_dataframes, prev_snapshot|None) -> DataFrame``;
:class:`ModelRegistry.run` topo-sorts, builds, and materializes each
through a :class:`SnapshotStore`.

Tags select subgraphs (``dbt run --select tag:feed_customers`` —
dbt_project.yml:44-57); ``full_refresh`` flips every model into its
non-incremental branch (SURVEY.md §3.3 — a semantically different
program, not just a config change).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from product_analytics_spark.sources.sinks import SnapshotStore

Builder = Callable[..., DataFrame]


@dataclass
class Model:
    name: str
    builder: Builder            # (deps: dict[str, DataFrame], prev: DataFrame|None, full_refresh: bool) -> DataFrame
    deps: Sequence[str] = ()
    unique_key: str | None = None          # None -> overwrite materialization
    partition_by: Sequence[str] = ()
    cluster_by: Sequence[str] = ()         # ZORDER-analog keys
    tags: frozenset[str] = field(default_factory=frozenset)


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def register(self, model: Model) -> None:
        self._models[model.name] = model

    def topo_order(
        self, select: set[str] | None = None, exact: bool = False
    ) -> list[Model]:
        """Kahn topo-sort; ``select`` filters by tag or name, pulling
        in upstream deps (dbt's ``+`` semantics). ``exact=True``
        selects ONLY the named models (dbt retry's subset: upstream
        results are served from their stored snapshots, not rebuilt)."""
        if select:
            wanted: set[str] = set()
            frontier = [
                m.name
                for m in self._models.values()
                if m.name in select or (m.tags & select)
            ]
            while frontier:
                n = frontier.pop()
                if n in wanted:
                    continue
                wanted.add(n)
                if exact:
                    continue
                # deps may name raw sources, which aren't registered models
                frontier.extend(d for d in self._models[n].deps if d in self._models)
        else:
            wanted = set(self._models)

        order: list[Model] = []
        done: set[str] = set()
        pending = [self._models[n] for n in sorted(wanted)]
        while pending:
            progressed = False
            for m in list(pending):
                if all(d in done or d not in wanted for d in m.deps):
                    order.append(m)
                    done.add(m.name)
                    pending.remove(m)
                    progressed = True
            if not progressed:
                raise ValueError(f"cycle among models: {[m.name for m in pending]}")
        return order

    def run(
        self,
        store: SnapshotStore,
        sources: Mapping[str, DataFrame],
        select: set[str] | None = None,
        full_refresh: bool = False,
    ) -> dict[str, DataFrame]:
        """Execute the (selected) DAG: build each model against its
        upstream outputs + prior snapshot, then materialize (merge for
        keyed incremental models, atomic overwrite otherwise).
        Returns {model_name: materialized DataFrame}."""
        outputs: dict[str, DataFrame] = dict(sources)
        for m in self.topo_order(select):
            deps = {d: outputs[d] for d in m.deps}
            prev = None if full_refresh else store.read(m.name)
            built = m.builder(deps, prev, full_refresh or prev is None)
            if m.unique_key and not full_refresh:
                outputs[m.name] = store.merge(
                    m.name, built, m.unique_key,
                    partition_by=m.partition_by, cluster_by=m.cluster_by,
                )
            else:
                store.overwrite(
                    m.name, built, partition_by=m.partition_by, cluster_by=m.cluster_by
                )
                outputs[m.name] = store.read(m.name)
        return outputs
