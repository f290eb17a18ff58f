import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.io import load_table, merge_table


def _df(spark, rows, cols=("id", "val")):
    return spark.createDataFrame(rows, list(cols))


def _read_sorted(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_merge_creates_when_absent(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a"), (2, "b")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]


def test_merge_updates_and_inserts(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a"), (2, "b")]), tmp_store, "id")
    merge_table(spark, _df(spark, [(2, "B"), (3, "c")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_is_idempotent(spark, tmp_store):
    src = _df(spark, [(1, "a"), (2, "b")])
    merge_table(spark, src, tmp_store, "id")
    merge_table(spark, src, tmp_store, "id")  # re-sync same window: no dupes
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]


def test_merge_schema_evolution_adds_columns(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a")]), tmp_store, "id")
    evolved = spark.createDataFrame([(2, "b", 9.5)], ["id", "val", "score"])
    merge_table(spark, evolved, tmp_store, "id")
    out = spark.read.parquet(tmp_store)
    assert set(out.columns) == {"id", "val", "score"}
    rows = {r["id"]: (r["val"], r["score"]) for r in out.collect()}
    assert rows[1] == ("a", None)  # old row got NULL for the new column
    assert rows[2] == ("b", 9.5)


def test_load_table_dispositions(spark, tmp_store):
    load_table(_df(spark, [(1, "a")]), tmp_store, "WRITE_TRUNCATE")
    load_table(_df(spark, [(2, "b")]), tmp_store, "WRITE_APPEND")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]
    load_table(_df(spark, [(9, "z")]), tmp_store, "WRITE_TRUNCATE")
    assert _read_sorted(spark, tmp_store) == [(9, "z")]
    with pytest.raises(Exception):
        load_table(_df(spark, [(1, "x")]), tmp_store, "WRITE_EMPTY")
    with pytest.raises(ValueError):
        load_table(_df(spark, [(1, "x")]), tmp_store, "NOT_A_MODE")


def test_dynamic_partition_overwrite_touches_only_landed_partitions(spark, tmp_path):
    """dynamic=True replaces ONLY the partitions present in the incoming
    frame; static overwrite would drop every other partition."""
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.io import write_partitioned

    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [(d, i, v) for d in ("2024-01-01", "2024-01-02", "2024-01-03")
         for i, v in ((1, 10), (2, 20))],
        "day string, id int, v int",
    )
    write_partitioned(base, path, "day")
    assert spark.read.parquet(path).count() == 6

    # re-land ONLY day 2 with corrected values
    fix = spark.createDataFrame([("2024-01-02", 9, 99)], "day string, id int, v int")
    write_partitioned(fix, path, "day", dynamic=True)
    got = spark.read.parquet(path)
    assert got.count() == 5  # 2+1+2 — days 1 and 3 untouched
    assert got.where(F.col("day") == "2024-01-02").collect()[0]["v"] == 99
    assert got.where(F.col("day") == "2024-01-01").count() == 2

    # contrast: static overwrite replaces the whole table
    write_partitioned(fix, path, "day")
    assert spark.read.parquet(path).count() == 1


# ---------------------------------------------------------------------------
# Crash-safety evidence for the join-rewrite MERGE's swap (r4 verdict item
# #2): the reference's native MERGE is transactional (lib/bigquery.py:
# 203-224); the parquet fallback must preserve the all-or-nothing property —
# after a crash at ANY step of the swap, the target is either fully old or
# fully new, never a mix of the two generations.
# ---------------------------------------------------------------------------
def _rename_crasher(monkeypatch, predicate):
    """Monkeypatch io-module os.rename to raise when predicate(src, dst)."""
    import os as _os

    import etl_for_dumdums_spark.io as io_mod

    real = _os.rename

    def fake(src, dst, *a, **kw):
        if predicate(str(src), str(dst)):
            raise OSError("injected crash mid-swap")
        return real(src, dst, *a, **kw)

    monkeypatch.setattr(io_mod.os, "rename", fake)
    return real


def test_merge_crash_before_backup_rename_leaves_target_fully_old(
    spark, tmp_store, monkeypatch
):
    """Crash at step 1 (target -> backup rename): target untouched."""
    old = [(1, "a"), (2, "b")]
    load_table(_df(spark, old), tmp_store)

    _rename_crasher(monkeypatch, lambda src, dst: src.rstrip("/") == tmp_store.rstrip("/"))
    with pytest.raises(OSError, match="injected"):
        merge_table(spark, _df(spark, [(2, "B"), (3, "c")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == sorted(old)  # fully old, no mix


def test_merge_crash_on_commit_rename_rolls_back_to_fully_old(
    spark, tmp_store, monkeypatch
):
    """Crash at step 2 (tmp -> target commit rename): the rollback restores
    the backup, so the target is again FULLY old — the new generation never
    becomes partially visible."""
    old = [(1, "a"), (2, "b")]
    load_table(_df(spark, old), tmp_store)

    _rename_crasher(
        monkeypatch,
        lambda src, dst: ".tmp-" in src and dst.rstrip("/") == tmp_store.rstrip("/"),
    )
    with pytest.raises(OSError, match="injected"):
        merge_table(spark, _df(spark, [(2, "B"), (3, "c")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == sorted(old)

    # and the interrupted merge is REPLAYABLE: with the fault cleared the
    # same merge lands completely (at-least-once delivery collapses cleanly)
    monkeypatch.undo()
    merge_table(spark, _df(spark, [(2, "B"), (3, "c")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_concurrent_reader_never_sees_mixed_generations(spark, tmp_store):
    """A reader hammering the target during repeated merges observes each
    generation fully or an error in the brief rename window (the documented
    non-isolation of a dir swap, io.py docstring) — NEVER a row set mixing
    two generations. Generations are disjoint id ranges so any mix is
    detectable from (count, sum)."""
    import threading

    gen0 = [(i, "g0") for i in range(1, 21)]
    load_table(_df(spark, gen0), tmp_store)

    valid = set()

    def sig(rows):
        return (len(rows), sum(r[0] for r in rows))

    valid.add(sig(gen0))
    observed, errors, stop = [], [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                rows = [tuple(r) for r in spark.read.parquet(tmp_store).collect()]
                observed.append(sig(rows))
            except Exception:  # missing-dir window during the swap
                errors.append(1)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    cur = gen0
    try:
        for g in range(1, 4):
            # replace EVERY row (same ids, new payload) and add a new block —
            # a mixed read would show a count/sum no generation ever had
            cur = [(i, f"g{g}") for i in range(1, 21 + 10 * g)]
            merge_table(spark, _df(spark, cur), tmp_store, "id")
            valid.add(sig(cur))
    finally:
        stop.set()
        t.join(timeout=30)

    assert observed, "reader never completed a single read"
    bad = [s for s in observed if s not in valid]
    assert not bad, f"reader saw mixed-generation states: {bad[:5]}"
    assert _read_sorted(spark, tmp_store) == sorted(cur)
