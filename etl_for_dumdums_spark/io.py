"""Table IO: reads, layered writes, and MERGE upsert with schema evolution.

Reproduces the reference's warehouse semantics (lib/bigquery.py:83-224) on
plain Spark + Parquet:

  * ``load_table``   — WRITE_TRUNCATE / WRITE_APPEND / WRITE_EMPTY
    (lib/bigquery.py:83-125)
  * ``merge_table``  — keyed MERGE upsert: WHEN MATCHED UPDATE all columns,
    WHEN NOT MATCHED INSERT (lib/bigquery.py:128-224). Without Delta on the
    classpath this is the join rewrite the survey recommends:
    ``target.anti_join(source, pk) ∪ source`` written atomically
    (write to a temp dir, then swap), preserving BigQuery MERGE's
    all-or-nothing visibility.
  * schema evolution — new columns in the incoming schema are appended to
    the target with NULLs (lib/bigquery.py:175-183).

At scale the anti-join shuffles on the primary key once; with a Delta/
Iceberg sink the same API maps to a native MERGE INTO (import-gated).
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # Delta is not on the classpath in this environment; gate it.
    from delta.tables import DeltaTable  # type: ignore

    _HAS_DELTA = True
except ImportError:
    _HAS_DELTA = False


def _delta_session(spark: SparkSession) -> bool:
    """True when THIS session was built with the Delta SQL extension —
    having delta-spark importable is not enough; the extension must be in
    the session conf for DeltaTable operations to resolve."""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:  # pragma: no cover - conf access is never expected to fail
        return False
    return "DeltaSparkSessionExtension" in exts


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_table(
    df: DataFrame, path: str, write_disposition: str = "WRITE_TRUNCATE"
) -> None:
    """Full-load semantics of the reference's load_table."""
    if write_disposition == "WRITE_TRUNCATE":
        mode = "overwrite"
    elif write_disposition == "WRITE_APPEND":
        mode = "append"
    elif write_disposition == "WRITE_EMPTY":
        mode = "error"
    else:
        raise ValueError(f"unknown write_disposition {write_disposition!r}")
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    *partition_cols: str,
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Write a table hive-partitioned by derived period columns (the
    reference derives posted_week/sale_month at ingest for exactly this —
    SURVEY §4 'partition-friendly columns'). Readers filtering on the
    partition column get directory-level pruning (PartitionFilters in the
    scan, zero data read for pruned partitions).

    ``dynamic=True`` switches overwrite to DYNAMIC partition overwrite
    (per-write option, no session mutation): only the partitions present
    in ``df`` are replaced, everything else is left untouched — the
    incremental daily-reload pattern (re-land today's partition without
    rewriting the year). Static overwrite (the default) replaces the
    whole table."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle (and without a sort, if sorted): the join's
    ClusteredDistribution is satisfied by the on-disk layout. This is the
    pre-shuffle trade for fact⋈fact joins repeated across runs at 100 TB —
    pay the shuffle once at write time, never at read time
    (tests/test_partitioning.py asserts the Exchange-free join plan)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def _evolve(target: DataFrame, source: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Align schemas: add source-only columns to target (NULL) and
    target-only columns to source (NULL) — BigQuery-style additive evolution."""
    tcols = {f.name: f.dataType for f in target.schema.fields}
    scols = {f.name: f.dataType for f in source.schema.fields}
    for name, dtype in scols.items():
        if name not in tcols:
            target = target.withColumn(name, F.lit(None).cast(dtype))
    for name, dtype in tcols.items():
        if name not in scols:
            source = source.withColumn(name, F.lit(None).cast(dtype))
    # stable column order: target order, then new columns sorted
    order = [f.name for f in target.schema.fields]
    return target.select(order), source.select(order)


def merge_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    primary_key: str,
) -> None:
    """Keyed upsert: rows in `source` replace same-key rows in the target;
    unmatched rows are inserted. Falls back to a plain load when the target
    doesn't exist (mirrors lib/bigquery.py:150-162).

    `source` must be unique on `primary_key` (last-write-wins dedup is the
    caller's staging concern, as in the reference's W1 dedup models).
    """
    target_path = Path(path)
    if not target_path.exists():
        if _HAS_DELTA and _delta_session(spark):  # pragma: no cover - optional leg
            source.write.format("delta").mode("overwrite").save(path)
        else:
            load_table(source, path, "WRITE_TRUNCATE")
        return

    if _HAS_DELTA and DeltaTable.isDeltaTable(spark, path):
        # Native transactional MERGE (reference lib/bigquery.py:203-212).
        # Schema evolution rides on spark.databricks.delta.schema.autoMerge
        # (set by the optional-leg session); reader isolation comes from the
        # Delta log instead of the parquet-swap below.
        DeltaTable.forPath(spark, path).alias("t").merge(
            source.alias("s"), f"t.{primary_key} = s.{primary_key}"
        ).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        return

    target = spark.read.parquet(path)
    target, source = _evolve(target, source)
    kept = target.join(source.select(primary_key), on=primary_key, how="left_anti")
    merged = kept.unionByName(source)

    # Crash-consistent swap (NOT reader-isolated: unlike the Delta path a
    # concurrent reader can observe a brief target-missing window between
    # the two renames — table formats exist precisely to close it).
    # Materialize fully to a sibling temp dir first, then two same-fs
    # renames; rollback restores the backup if the second rename fails.
    tmp = str(target_path.parent / f".{target_path.name}.tmp-{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").parquet(tmp)
    backup = str(target_path.parent / f".{target_path.name}.bak-{uuid.uuid4().hex[:8]}")
    os.rename(str(target_path), backup)
    try:
        os.rename(tmp, str(target_path))
    except Exception:
        os.rename(backup, str(target_path))
        raise
    # cleanup OUTSIDE the failure path: a stray backup dir must never fail a
    # merge that already swapped successfully
    try:
        shutil.rmtree(backup)
    except OSError:  # pragma: no cover - stray dir is cleaned next merge
        pass
    for stale in target_path.parent.glob(f".{target_path.name}.bak-*"):
        try:
            shutil.rmtree(stale)
        except OSError:  # pragma: no cover
            pass
