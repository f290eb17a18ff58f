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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# field order is the schema contract; ts is epoch micros (JSONL carries no
# native timestamp type)
_FIELDS = ("event_id", "ts_us", "user_id", "event_type", "value")
_SCHEMA = "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"


def _layout_key(filename: str) -> str:
    """event_type encoded in the filename: ``<etype>.jsonl`` (export layout)
    or ``<etype>-part<n>.jsonl`` (writer layout) — both prunable."""
    stem = filename[: -len(".jsonl")]
    return stem.split("-part")[0] if "-part" in stem else stem


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
            etype = _layout_key(name)
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


# ---------------------------------------------------------------------------
# Writer: executor tasks write invisible ``*.jsonl.tmp`` files (the batch
# reader only lists ``*.jsonl``), split per event_type so the written layout
# keeps the pruning contract; the DRIVER's commit() renames them into
# visibility atomically-enough for the listing reader and abort() deletes
# them — the standard two-phase commit of a Spark sink, in Python.
# ---------------------------------------------------------------------------
@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    tmp_files: tuple  # ((tmp_path, final_name, n_rows), ...)


class JsonlEventsWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self._dir = options["path"]
        self._overwrite = overwrite

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> JsonlCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        handles: dict[str, object] = {}
        counts: dict[str, int] = {}
        for row in iterator:
            et = row["event_type"]
            fh = handles.get(et)
            if fh is None:
                tmp = os.path.join(self._dir, f"{et}-part{pid:05d}.jsonl.tmp")
                fh = open(tmp, "w", encoding="utf-8")
                handles[et] = fh
                counts[et] = 0
            fh.write(json.dumps({k: row[k] for k in _FIELDS}) + "\n")
            counts[et] += 1
        for fh in handles.values():
            fh.close()
        return JsonlCommitMessage(
            tmp_files=tuple(
                (
                    os.path.join(self._dir, f"{et}-part{pid:05d}.jsonl.tmp"),
                    f"{et}-part{pid:05d}.jsonl",
                    counts[et],
                )
                for et in handles
            )
        )

    # -- driver side ------------------------------------------------------
    def commit(self, messages) -> None:
        if self._overwrite:
            for name in os.listdir(self._dir):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(self._dir, name))
        total = 0
        committed = []
        for m in messages:
            if m is None:
                continue
            for tmp, final, n in m.tmp_files:
                os.replace(tmp, os.path.join(self._dir, final))
                committed.append({"file": final, "rows": n})
                total += n
        with open(os.path.join(self._dir, "_MANIFEST.json"), "w", encoding="utf-8") as fh:
            json.dump({"files": committed, "total_rows": total}, fh)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _final, _n in m.tmp_files:
                if os.path.exists(tmp):
                    os.remove(tmp)


# ---------------------------------------------------------------------------
# Streaming reader: tails the directory's committed .jsonl files with a
# per-file line-count offset — new lines (and new files) appearing between
# micro-batches are exactly the next batch, and readBetweenOffsets replays
# any batch deterministically for failure recovery. The Simple variant reads
# on the driver (right for this demo volume); the partitioned
# DataSourceStreamReader is the same offset contract fanned out per file
# when throughput demands it.
# ---------------------------------------------------------------------------
class JsonlEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._dir = options["path"]

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _lines(self, name: str) -> list:
        with open(os.path.join(self._dir, name), encoding="utf-8") as fh:
            return [ln for ln in fh if ln.strip()]

    def read(self, start: dict):
        seen = dict(start.get("files", {}))
        rows = []
        for name in sorted(os.listdir(self._dir)):
            if not name.endswith(".jsonl"):
                continue
            lines = self._lines(name)
            done = int(seen.get(name, 0))
            for ln in lines[done:]:
                rec = json.loads(ln)
                rows.append(tuple(rec.get(k) for k in _FIELDS))
            seen[name] = len(lines)
        return iter(rows), {"files": seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        s = start.get("files", {})
        e = end.get("files", {})
        rows = []
        for name in sorted(e):
            lines = self._lines(name)
            for ln in lines[int(s.get(name, 0)) : int(e[name])]:
                rec = json.loads(ln)
                rows.append(tuple(rec.get(k) for k in _FIELDS))
        return iter(rows)


class JsonlEventsDataSource(DataSource):
    """``spark.read.format("jsonl_events").option("path", dir).load()`` /
    ``df.write.format("jsonl_events")`` / ``spark.readStream.format(...)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> JsonlEventsReader:
        return JsonlEventsReader(self.options)

    def writer(self, schema, overwrite: bool) -> JsonlEventsWriter:
        return JsonlEventsWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> JsonlEventsStreamReader:
        return JsonlEventsStreamReader(self.options)


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
