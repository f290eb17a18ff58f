"""Spark 4 Python DataSource (sources/pydatasource.py): partitioned JSONL
read, schema contract, and file-pruning filter pushdown."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    from etl_for_dumdums_spark.sources.pydatasource import dump_events_jsonl

    d = str(tmp_path_factory.mktemp("jsonl_events"))
    n = dump_events_jsonl(SF_SMOKE, d)
    assert n > 0
    return d


def test_roundtrip_matches_parquet(spark, jsonl_dir):
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.sources.pydatasource import register_python_datasources

    register_python_datasources(spark)
    got = spark.read.format("jsonl_events").option("path", jsonl_dir).load()
    exp = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )
    assert got.count() == exp.count()
    assert [f.name for f in got.schema.fields] == [f.name for f in exp.schema.fields]
    # full value equality, order-insensitive
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_partitions_one_per_file(jsonl_dir):
    import os

    from etl_for_dumdums_spark.sources.pydatasource import JsonlEventsReader

    r = JsonlEventsReader({"path": jsonl_dir})
    files = sorted(f for f in os.listdir(jsonl_dir) if f.endswith(".jsonl"))
    assert [os.path.basename(p.path) for p in r.partitions()] == files
    assert len(files) == 5  # one per event_type


def test_push_filters_prunes_files_and_returns_rest(jsonl_dir):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from etl_for_dumdums_spark.sources.pydatasource import JsonlEventsReader

    r = JsonlEventsReader({"path": jsonl_dir})
    rest = list(
        r.pushFilters(
            [EqualTo(("event_type",), "view"), GreaterThan(("value",), 1.0)]
        )
    )
    # the layout filter is consumed; the value filter is handed back
    assert rest == [GreaterThan(("value",), 1.0)]
    assert [p.path.rsplit("/", 1)[1] for p in r.partitions()] == ["view.jsonl"]

    # In() narrows; a second conflicting push intersects to the empty set
    r2 = JsonlEventsReader({"path": jsonl_dir})
    assert list(r2.pushFilters([In(("event_type",), ("view", "click"))])) == []
    assert len(r2.partitions()) == 2
    assert list(r2.pushFilters([EqualTo(("event_type",), "purchase")])) == []
    assert r2.partitions() == []


def test_end_to_end_filtered_read_matches(spark, jsonl_dir):
    from etl_for_dumdums_spark.sources.pydatasource import register_python_datasources

    register_python_datasources(spark)
    got = (
        spark.read.format("jsonl_events")
        .option("path", jsonl_dir)
        .load()
        .where("event_type = 'purchase' AND value > 100")
        .count()
    )
    exp = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where("event_type = 'purchase' AND value > 100")
        .count()
    )
    assert got == exp and got > 0


def test_writer_roundtrip_preserves_layout_and_pruning(spark, jsonl_dir, tmp_path):
    """df.write → two-phase commit into <etype>-partNNNNN.jsonl files; the
    batch reader reads them back exactly and can still prune by layout key."""
    import json
    import os

    from etl_for_dumdums_spark.sources.pydatasource import (
        JsonlEventsReader,
        register_python_datasources,
    )
    from pyspark.sql.datasource import EqualTo

    register_python_datasources(spark)
    src = spark.read.format("jsonl_events").option("path", jsonl_dir).load()
    out = str(tmp_path / "written")
    os.makedirs(out)
    src.write.format("jsonl_events").mode("append").option("path", out).save()

    # two-phase commit left no temp files; the manifest accounts every row
    names = sorted(os.listdir(out))
    assert not [n for n in names if n.endswith(".tmp")]
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == src.count()
    assert sum(f["rows"] for f in manifest["files"]) == manifest["total_rows"]

    back = spark.read.format("jsonl_events").option("path", out).load()
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0

    # pruning works on the written layout too
    r = JsonlEventsReader({"path": out})
    r.pushFilters([EqualTo(("event_type",), "view")])
    assert {os.path.basename(p.path).split("-part")[0] for p in r.partitions()} == {"view"}


def test_writer_abort_removes_temp_files(tmp_path):
    """Unit-level: a failed job's abort() deletes every temp file written."""
    import os

    from etl_for_dumdums_spark.sources.pydatasource import (
        JsonlCommitMessage,
        JsonlEventsWriter,
    )

    d = str(tmp_path / "abort")
    os.makedirs(d)
    tmp = os.path.join(d, "view-part00000.jsonl.tmp")
    open(tmp, "w").write('{"event_id": 1}\n')
    w = JsonlEventsWriter({"path": d}, overwrite=False)
    w.abort([JsonlCommitMessage(tmp_files=((tmp, "view-part00000.jsonl", 1),)), None])
    assert os.listdir(d) == []


def test_stream_reader_offsets_and_replay(tmp_path):
    """Unit-level: per-file line offsets advance, only new lines surface on
    the next read, and readBetweenOffsets replays a batch deterministically."""
    import json
    import os

    from etl_for_dumdums_spark.sources.pydatasource import JsonlEventsStreamReader

    d = str(tmp_path / "stream")
    os.makedirs(d)

    def emit(name, *ids):
        with open(os.path.join(d, name), "a") as fh:
            for i in ids:
                fh.write(json.dumps({"event_id": i, "ts_us": i, "user_id": i,
                                     "event_type": name[:-6], "value": 1.0}) + "\n")

    r = JsonlEventsStreamReader({"path": d})
    o0 = r.initialOffset()
    emit("view.jsonl", 1, 2)
    rows1, o1 = r.read(o0)
    assert [t[0] for t in rows1] == [1, 2] and o1 == {"files": {"view.jsonl": 2}}

    emit("view.jsonl", 3)
    emit("click.jsonl", 10)
    rows2, o2 = r.read(o1)
    assert sorted(t[0] for t in rows2) == [3, 10]
    assert o2 == {"files": {"view.jsonl": 3, "click.jsonl": 1}}

    # deterministic replay of batch 2 for recovery
    replay = list(r.readBetweenOffsets(o1, o2))
    assert sorted(t[0] for t in replay) == [3, 10]
    # batch 1 replay unaffected by later appends
    assert [t[0] for t in r.readBetweenOffsets(o0, o1)] == [1, 2]


def test_stream_end_to_end_microbatches(spark, tmp_path):
    """readStream over the source: availableNow batch 1 ingests the current
    files; after appending lines, a second run from the SAME checkpoint
    ingests only the delta (offsets survive restart)."""
    import json
    import os

    from etl_for_dumdums_spark.sources.pydatasource import register_python_datasources

    register_python_datasources(spark)
    d = str(tmp_path / "sdir")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)

    def emit(name, *ids):
        with open(os.path.join(d, name), "a") as fh:
            for i in ids:
                fh.write(json.dumps({"event_id": i, "ts_us": i, "user_id": i,
                                     "event_type": name[:-6], "value": 1.0}) + "\n")

    def run_once():
        got: set = set()

        def sink(batch_df, _bid):
            got.update(r["event_id"] for r in batch_df.collect())

        q = (
            spark.readStream.format("jsonl_events")
            .option("path", d)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    emit("view.jsonl", 1, 2)
    assert run_once() == {1, 2}
    emit("view.jsonl", 3)
    assert run_once() == {3}  # only the delta — offsets checkpointed
