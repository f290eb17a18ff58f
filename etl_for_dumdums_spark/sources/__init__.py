"""Source connector contract (reference lib/source.py:18-84 re-expressed).

A Source produces a DataFrame (instead of list-of-dicts) and declares its
destination + primary key; ``run_sync`` is the fetch→transform→load-or-merge
driver. Paginated REST fetching happens driver-side for small APIs (as in
the reference); at scale a key-range partitioned ``mapInPandas`` fetch is
the pattern (see ParallelFetchSource).
"""

from __future__ import annotations

import abc
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..io import load_table, merge_table


class Source(abc.ABC):
    """Contract mirror of reference lib/source.py:18-44."""

    dataset_id: str
    table_id: str
    primary_key: str
    schema: T.StructType

    @abc.abstractmethod
    def fetch(self, spark: SparkSession) -> Iterable[dict]:
        """Pull raw rows (driver-side; small API volumes)."""

    def transform(self, spark: SparkSession, raw: Iterable[dict]) -> DataFrame:
        """Reshape raw rows into the declared schema. Default: as-is."""
        return spark.createDataFrame(list(raw), schema=self.schema)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.transform(spark, self.fetch(spark))


def run_sync(
    spark: SparkSession,
    source: Source,
    base_path: str,
    full_refresh: bool = False,
) -> str:
    """fetch → transform → load-or-merge (reference lib/source.py:47-84).

    Incremental runs MERGE on the primary key (idempotent: re-syncing an
    overlapping window cannot create duplicates); full_refresh truncates.
    """
    df = source.read(spark)
    path = f"{base_path}/{source.dataset_id}/{source.table_id}"
    if full_refresh:
        load_table(df, path, "WRITE_TRUNCATE")
    else:
        merge_table(spark, df, path, source.primary_key)
    return path


class StaticSource(Source):
    """Test/demo source backed by in-memory rows."""

    def __init__(self, dataset_id, table_id, primary_key, schema, rows):
        self.dataset_id = dataset_id
        self.table_id = table_id
        self.primary_key = primary_key
        self.schema = schema
        self._rows = rows

    def fetch(self, spark: SparkSession):
        return list(self._rows)


class PaginatedRestSource(Source):
    """Cursor/page/token pagination skeleton (reference sources/linear.py:93-136,
    github.py:73-111, oura.py:37-77). The HTTP call is injected so tests and
    offline runs use a deterministic fake; production supplies a session.
    """

    page_size = 100

    def __init__(self, fetch_page, *, dataset_id, table_id, primary_key, schema):
        # fetch_page(cursor) -> (rows, next_cursor | None)
        self._fetch_page = fetch_page
        self.dataset_id = dataset_id
        self.table_id = table_id
        self.primary_key = primary_key
        self.schema = schema

    def fetch(self, spark: SparkSession):
        rows: list[dict] = []
        cursor: Optional[str] = None
        while True:
            page, cursor = self._fetch_page(cursor)
            rows.extend(page)
            if not cursor:
                break
        return rows


def throttled_detail_fetch(
    keys: DataFrame,
    fetch_fn,
    out_schema,
    key_col: str = "id",
    delay_seconds: float = 0.0,
):
    """Per-key detail fetch with client-side rate limiting (S11: the
    reference fetches per-PR details with a 50 ms delay,
    sources/github.py:269-315). Distributed via mapInPandas: each partition
    walks its keys serially with the delay, partitions run in parallel —
    the Spark-native replacement for the reference's thread pool. fetch_fn
    must be picklable (module-level or functools.partial).
    """
    import pandas as pd

    def run(batches):
        import time as _time

        for pdf in batches:
            rows = []
            for key in pdf[key_col]:
                rows.append(fetch_fn(key))
                if delay_seconds:
                    _time.sleep(delay_seconds)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return keys.mapInPandas(run, schema=out_schema)


class ParquetSource(Source):
    """Warehouse-to-warehouse scan (reference sources/hacker_news.py:61-94):
    read a parquet table with pushdown filter + derived columns."""

    def __init__(self, path, *, dataset_id, table_id, primary_key, transform_df=None):
        self._path = path
        self._transform_df = transform_df
        self.dataset_id = dataset_id
        self.table_id = table_id
        self.primary_key = primary_key
        self.schema = None  # inherited from parquet

    def fetch(self, spark: SparkSession):  # pragma: no cover - unused
        raise NotImplementedError("ParquetSource reads directly")

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self._path)
        return self._transform_df(df) if self._transform_df else df
