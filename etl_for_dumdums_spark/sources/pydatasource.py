"""Spark 4 Python DataSource: a partitioned JSONL reader with filter pushdown.

The connector layer elsewhere in this package (sources/__init__.py,
sources/connectors.py) follows the reference's fetch-then-createDataFrame
protocol (reference ``lib/sources.py``-style sync drivers). This module shows
the OTHER integration point Spark offers Python code: a first-class
``spark.read.format(...)`` source (``pyspark.sql.datasource``, Spark 4's
Python Data Source API), where

* **partition planning runs on the driver** (one ``InputPartition`` per
  data file → Spark schedules one task per partition, so reads parallelize
  across executors exactly like a built-in source);
* **filter pushdown** (``pushFilters``) prunes whole files when a predicate
  constrains the hive-style ``event_type`` the files are laid out by —
  ``EqualTo`` / ``In`` on the layout key are consumed here, every other
  filter is returned to Spark to re-apply (the contract that keeps pruning
  an optimization, never a semantics change);
* **per-partition reads run on executors** (``read`` is called inside the
  task with only its partition), so no data ever funnels through the driver.

At 100 TB this is how a Python-only format gets scan parallelism + pruning
without a JVM connector. The format here is newline-delimited JSON laid out
as ``<dir>/<event_type>.jsonl`` — the layout IS the partition key, the same
contract as hive-partitioned parquet directories.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

# field order is the schema contract; ts is epoch micros (JSONL carries no
# native timestamp type)
_FIELDS = ("event_id", "ts_us", "user_id", "event_type", "value")
_SCHEMA = "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"


class JsonlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlEventsReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options["path"]
        self._allowed: set[str] | None = None  # None → no pushed constraint

    # -- driver side ------------------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Consume event_type equality/membership filters (they prune whole
        files); hand every other filter back for Spark to evaluate."""
        remaining: list[Filter] = []
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("event_type",):
                self._narrow({str(f.value)})
            elif isinstance(f, In) and tuple(f.attribute) == ("event_type",):
                self._narrow({str(v) for v in f.value})
            else:
                remaining.append(f)
        return remaining

    def _narrow(self, types: set[str]) -> None:
        self._allowed = types if self._allowed is None else (self._allowed & types)

    def partitions(self) -> Sequence[InputPartition]:
        parts = []
        for name in sorted(os.listdir(self._dir)):
            if not name.endswith(".jsonl"):
                continue
            etype = name[: -len(".jsonl")]
            if self._allowed is not None and etype not in self._allowed:
                continue
            parts.append(JsonlFilePartition(os.path.join(self._dir, name)))
        return parts

    # -- executor side ----------------------------------------------------
    def read(self, partition: JsonlFilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(k) for k in _FIELDS)


class JsonlEventsDataSource(DataSource):
    """``spark.read.format("jsonl_events").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> JsonlEventsReader:
        return JsonlEventsReader(self.options)


def register_python_datasources(spark) -> None:
    # Python-source filter pushdown is opt-in (runtime SQL conf); without it
    # Spark refuses a reader that implements pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlEventsDataSource)


def dump_events_jsonl(sf_dir: str, out_dir: str) -> int:
    """Lay out the testdata events table as <event_type>.jsonl files (the
    fixture/export side of the layout contract). Returns rows written."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    rows = duckdb.sql(
        f"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
            FROM '{sf_dir}/events.parquet' ORDER BY event_type, event_id"""
    ).fetchall()
    handles: dict[str, object] = {}
    try:
        for event_id, ts_us, user_id, event_type, value in rows:
            fh = handles.get(event_type)
            if fh is None:
                fh = open(os.path.join(out_dir, f"{event_type}.jsonl"), "w", encoding="utf-8")
                handles[event_type] = fh
            fh.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts_us": ts_us,
                        "user_id": user_id,
                        "event_type": event_type,
                        "value": value,
                    }
                )
                + "\n"
            )
    finally:
        for fh in handles.values():
            fh.close()
    return len(rows)
