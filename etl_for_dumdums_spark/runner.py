"""Model-DAG runner: the reference's `dbt build` re-expressed.

A model registry maps name → builder (a callable producing a DataFrame from
the session, or a SQL string). Dependencies are declared via ``ref('name')``
(mirroring dbt's {{ ref() }}); the runner topo-sorts and executes each model,
materializing as temp views (staging) or parquet tables (marts) — the same
view/table split as dbt_project.yml:19-26.

Independent DAG branches could be submitted concurrently (dbt runs 4
threads, dbt/profiles.yml:13); Spark's scheduler already parallelizes within
each job, so the runner stays sequential and lets the cluster do the work.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    builder: Union[Callable[..., DataFrame], str]  # fn(spark, **deps) or SQL text
    deps: list[str] = field(default_factory=list)
    materialization: str = "view"  # 'view' | 'table' | 'ephemeral'
    path: Optional[str] = None  # parquet destination for 'table'


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def model(
        self,
        name: str,
        deps: Optional[list[str]] = None,
        materialization: str = "view",
        path: Optional[str] = None,
    ):
        """Decorator: register fn(spark, **dep_dataframes) -> DataFrame."""

        def deco(fn):
            self._models[name] = Model(name, fn, deps or [], materialization, path)
            return fn

        return deco

    def sql_model(
        self,
        name: str,
        sql: str,
        deps: Optional[list[str]] = None,
        materialization: str = "view",
        path: Optional[str] = None,
    ) -> None:
        """Register a SQL-text model; deps must already be views."""
        self._models[name] = Model(name, sql, deps or [], materialization, path)

    def topo_order(self, targets: Optional[list[str]] = None) -> list[str]:
        wanted = set(self._models) if targets is None else set()
        if targets:
            stack = list(targets)
            while stack:
                m = stack.pop()
                if m not in wanted:
                    wanted.add(m)
                    stack.extend(self._models[m].deps)
        ts = TopologicalSorter({n: set(self._models[n].deps) for n in wanted})
        return list(ts.static_order())

    def build(
        self, spark: SparkSession, targets: Optional[list[str]] = None
    ) -> dict[str, DataFrame]:
        """Execute the DAG; returns every materialized DataFrame by name."""
        built: dict[str, DataFrame] = {}
        for name in self.topo_order(targets):
            model = self._models[name]
            if isinstance(model.builder, str):
                df = spark.sql(model.builder)
            else:
                df = model.builder(spark, **{d: built[d] for d in model.deps})
            if model.materialization == "table" and model.path:
                df.write.mode("overwrite").parquet(model.path)
                df = spark.read.parquet(model.path)
            if model.materialization in ("view", "table"):
                df.createOrReplaceTempView(name)
            built[name] = df
        return built
