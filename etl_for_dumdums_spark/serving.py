"""Serving layer: the reference's cached dashboard loaders (S17).

data.py in the reference wraps 24 ``SELECT ... ORDER BY ...`` loaders in
``st.cache_data(ttl=300)`` (data.py:17-408). Spark equivalent: a loader
registry whose results are Spark-cached on first use with a TTL-based
invalidation — repeated dashboard reads hit the in-memory columnar cache,
not the parquet scan.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class LoaderRegistry:
    def __init__(self, ttl_seconds: float = 300.0, clock: Callable[[], float] = time.monotonic):
        self._ttl = ttl_seconds
        self._clock = clock
        self._loaders: dict[str, Callable[[SparkSession], DataFrame]] = {}
        self._cache: dict[str, tuple[float, DataFrame]] = {}

    def loader(self, name: str):
        def deco(fn: Callable[[SparkSession], DataFrame]):
            self._loaders[name] = fn
            return fn

        return deco

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        now = self._clock()
        hit = self._cache.get(name)
        if hit is not None and now - hit[0] < self._ttl:
            return hit[1]
        if hit is not None:
            hit[1].unpersist()
        df = self._loaders[name](spark).cache()
        self._cache[name] = (now, df)
        return df

    def invalidate(self, name: str | None = None) -> None:
        names = [name] if name else list(self._cache)
        for n in names:
            cached = self._cache.pop(n, None)
            if cached is not None:
                cached[1].unpersist()
