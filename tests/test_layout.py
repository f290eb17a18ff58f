"""Z-order layout: interleave correctness + measured file pruning.

The point of the operator is the measurable payoff, so the main test
writes the SAME data twice (z-ordered vs unsorted) and asserts the
z-ordered layout touches strictly fewer files for a 2-d box predicate,
using real parquet footer stats — not a claim, a measurement."""

import shutil

import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.layout import (
    file_minmax,
    file_pruning_stats,
    interleave_bits,
    quantile_buckets,
    write_zordered,
)

from .conftest import SF_SMOKE


def test_interleave_bits_known_values(spark):
    # x=0b11, y=0b01 → bits of x at even positions, y at odd: 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], ["x", "y"])
    out = df.select(interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z")).head().z
    assert out == 0b0111
    # interleave is monotone per dimension with the other fixed
    df2 = spark.createDataFrame([(x, 5) for x in range(8)], ["x", "y"])
    zs = [r.z for r in df2.select(interleave_bits([F.col("x"), F.col("y")], 4).alias("z")).collect()]
    assert zs == sorted(zs)


def test_zorder_write_prunes_files(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", F.col("value")
    )
    zpath, plainpath = str(tmp_path / "z"), str(tmp_path / "plain")
    write_zordered(events, zpath, ["user_id", "value"], n_files=8)
    events.repartition(8).write.mode("overwrite").parquet(plainpath)

    # box: a small corner of the (user_id, value) space
    box = {"user_id": (0, 9), "value": (0.0, 5.0)}
    z_stats = file_pruning_stats(zpath, box)
    p_stats = file_pruning_stats(plainpath, box)
    assert z_stats["n_files"] == 8 and p_stats["n_files"] == 8
    # random layout: every file spans the whole space → nothing prunes
    assert p_stats["n_touched"] == 8
    # z-order: the corner box must live in a strict subset of files
    assert z_stats["n_touched"] < p_stats["n_touched"]

    # same rows either way (layout is not content)
    n = events.count()
    assert spark.read.parquet(zpath).count() == n
    shutil.rmtree(zpath), shutil.rmtree(plainpath)


def test_zorder_files_cover_disjoint_z_ranges(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    path = str(tmp_path / "z2")
    write_zordered(events, path, ["user_id", "event_id"], n_files=4)
    # per-file user_id ranges should be narrow: total span of each file's
    # [min,max] well under 4x the full domain (random layout would be ~4x)
    ranges = file_minmax(path, "user_id")
    full = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
    spans = sum(hi - lo for lo, hi in ranges)
    assert spans < 2.5 * full, (ranges, full)
    shutil.rmtree(path)


def test_quantile_buckets_monotone(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 5, 2, 100, 50, 7, 3, 9]], ["v"])
    with_b = df.select("v", quantile_buckets(df, "v", bits=8).alias("b")).collect()
    by_v = sorted(with_b, key=lambda r: r.v)
    bs = [r.b for r in by_v]
    assert bs == sorted(bs)  # bucket id monotone in value
    assert bs[0] < bs[-1]  # actually spreads
