"""Exercises the native Delta MERGE branch of io.merge_table.

delta-spark is not installed in this environment, so the branch is driven
through a recording double that implements the exact DeltaTable fluent
surface the code uses (forPath → alias → merge → whenMatchedUpdateAll →
whenNotMatchedInsertAll → execute). This pins the branch's wiring — the
merge condition, the update/insert clauses, and the early return that must
skip the parquet-swap fallback — so enabling real Delta is a config change,
not a code change.
"""

from __future__ import annotations

import pytest

from etl_for_dumdums_spark import io as io_mod

from .conftest import SF_SMOKE  # noqa: F401  (ensures package import path)


class _FakeMergeBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdateAll(self):
        self.log.append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        self.log.append("execute")


class _FakeDeltaTable:
    instances: list["_FakeDeltaTable"] = []

    def __init__(self, path):
        self.path = path
        self.log: list[str] = []
        self.merge_condition = None
        self._builder = _FakeMergeBuilder(log=[])
        _FakeDeltaTable.instances.append(self)

    @classmethod
    def isDeltaTable(cls, spark, path):
        # the double stands in for a real Delta target (which would carry a
        # _delta_log); detection is part of the pinned wiring
        return True

    @classmethod
    def forPath(cls, spark, path):
        return cls(path)

    def alias(self, name):
        self.log.append(f"alias:{name}")
        return self

    def merge(self, source, condition):
        self.log.append("merge")
        self.merge_condition = condition
        self.merge_source = source
        return self._builder


@pytest.fixture
def fake_delta(monkeypatch):
    _FakeDeltaTable.instances = []
    monkeypatch.setattr(io_mod, "_HAS_DELTA", True)
    monkeypatch.setattr(io_mod, "DeltaTable", _FakeDeltaTable, raising=False)
    return _FakeDeltaTable


def test_delta_merge_branch_wiring(spark, tmp_path, fake_delta):
    src = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    target = tmp_path / "tbl"
    # seed the target so merge_table takes the merge path, not the first-load path
    src.write.parquet(str(target))

    io_mod.merge_table(spark, src, str(target), "id")

    assert len(fake_delta.instances) == 1
    dt = fake_delta.instances[0]
    assert dt.path == str(target)
    assert dt.merge_condition == "t.id = s.id"
    assert dt.log == ["alias:t", "merge"]
    assert dt._builder.log == [
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "execute",
    ]
    # the native branch must return before the parquet swap: no tmp/backup dirs
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "tbl"]
    assert leftovers == []


def test_delta_branch_skipped_on_first_load(spark, tmp_path, fake_delta):
    src = spark.createDataFrame([(1, "a")], ["id", "v"])
    target = tmp_path / "fresh"
    io_mod.merge_table(spark, src, str(target), "id")
    # first load goes through load_table regardless of Delta availability
    assert fake_delta.instances == []
    assert spark.read.parquet(str(target)).count() == 1
