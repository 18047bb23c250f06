"""Model registry — dbt's DAG + materialization config, Spark-style
(SURVEY.md §3.3 step 5).

A model is (name, fn(deps→DataFrame), list-of-dep-names, materialization).
``ref()`` ≙ dict lookup; execution order is a topological sort (~20 lines,
as promised); materializations:

- ``view``        → createOrReplaceTempView (lazy — Catalyst inlines it)
- ``table``       → saveAsTable / parquet write (materialization fence)
- ``ephemeral``   → plain DataFrame handoff (pure composition)

Views stay lazy so a downstream model composes into ONE optimized plan —
the property dbt-on-BigQuery only gets via the warehouse's own optimizer.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    fn: Callable[..., DataFrame]
    deps: list[str] = field(default_factory=list)
    materialization: str = "view"  # view | table | ephemeral


class ModelRegistry:
    def __init__(self, spark: SparkSession, warehouse_dir: str | None = None):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self._models: dict[str, Model] = {}
        self._results: dict[str, DataFrame] = {}

    def source(self, name: str, df: DataFrame) -> None:
        """Register a source relation (dbt ``source()``)."""
        self._results[name] = df

    def model(
        self,
        name: str,
        fn: Callable[..., DataFrame],
        deps: list[str],
        materialization: str = "view",
    ) -> None:
        self._models[name] = Model(name, fn, deps, materialization)

    def _toposort(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(name: str) -> None:
            if name in seen or name in self._results:
                return
            if name in visiting:
                raise ValueError(f"model cycle at {name}")
            visiting.add(name)
            for d in self._models[name].deps:
                visit(d)
            visiting.discard(name)
            seen.add(name)
            order.append(name)

        for name in self._models:
            visit(name)
        return order

    def run(self) -> dict[str, DataFrame]:
        """Materialize all models in dependency order (dbt run)."""
        for name in self._toposort():
            m = self._models[name]
            df = m.fn(*[self._results[d] for d in m.deps])
            if m.materialization == "table":
                if self.warehouse_dir:
                    path = f"{self.warehouse_dir}/{name}"
                    df.write.mode("overwrite").parquet(path)
                    df = self.spark.read.parquet(path)
                else:
                    df = df.localCheckpoint(eager=True)
            elif m.materialization == "view":
                df.createOrReplaceTempView(name)
            self._results[name] = df
        return dict(self._results)

    def ref(self, name: str) -> DataFrame:
        return self._results[name]
