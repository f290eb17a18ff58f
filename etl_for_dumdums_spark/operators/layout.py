"""Z-order data layout: multi-dimensional clustering for scan pruning.

At 100 TB the dominant cost of a selective query is how many files/row
groups the scan must open. Partitioning prunes on ONE column; Z-ordering
(Morton order) clusters on SEVERAL at once: interleave the bits of the
(rank-normalized) key columns into one z-value, range-partition and sort
the write by it, and every file ends up covering a small hyper-rectangle
of the key space. Parquet min/max footer stats then prune files for
predicates on ANY of the z-columns — the same idea behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, built here from primitives:

  * ``zorder_value`` — bit interleave as a pure column expression (stays
    inside whole-stage codegen; no UDF);
  * ``rank_normalize`` — percent_rank → fixed-width integer, so skewed or
    unbounded domains (timestamps, ids) spread evenly across the z-curve;
    one window per column over the SAME single partition as the final
    range-write sort would need — at scale swap in ``approxQuantile``
    bucketing to avoid the global window (hook provided);
  * ``write_zordered`` — repartitionByRange + sortWithinPartitions on the
    z-value, then drop it and write parquet;
  * ``file_pruning_stats`` — reads parquet footers (no Spark job) and
    reports how many files a box predicate would touch — the measurable
    payoff, asserted in tests rather than claimed.

A z-value is NOT row content: it exists only during the write. Readers see
the original schema; they just get files whose min/max ranges are tight.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = _DEFAULT_BITS) -> Column:
    """Morton-interleave the low ``bits`` of each integer column into one
    long. Bit j of column i lands at position j * n_cols + i. Built as a
    fold of shift/or column expressions — Catalyst folds it into a single
    codegen stage, no Python per row."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def rank_normalize(df: DataFrame, col: str, bits: int = _DEFAULT_BITS) -> Column:
    """Map a column of any orderable type to [0, 2^bits) by percent rank.
    Even extreme skew or unbounded domains then spread uniformly along the
    z-curve. Uses one unpartitioned window — acceptable for a per-write
    layout pass at test scale; at 100 TB use ``quantile_buckets`` below
    (sampled quantiles, no global window) for the same effect."""
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(F.col(col)))
    return F.least(F.floor(pr * (2**bits)), F.lit(2**bits - 1)).cast("long")


def quantile_buckets(df: DataFrame, col: str, bits: int = _DEFAULT_BITS) -> Column:
    """Scale path for rank_normalize: bucket by approxQuantile boundaries
    (computed from a sample, broadcast as a literal array) — no global
    window, no extra shuffle. Monotone in ``col``, so z-locality holds."""
    n_buckets = 2**bits
    # cap boundary count: 2^16 boundaries is needless precision for pruning
    n_q = min(n_buckets, 256)
    qs = df.approxQuantile(col, [i / n_q for i in range(1, n_q)], 0.01)
    arr = F.array(*[F.lit(q) for q in qs])
    # index of first boundary > value == bucket id, scaled up to bit width
    bucket = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: F.when(F.col(col).cast("double") >= b, acc + 1).otherwise(acc),
    )
    return (bucket * (n_buckets // n_q)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = _DEFAULT_BITS,
    normalize: bool = True,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    normalize=True rank-normalizes each column first (right for ids,
    timestamps, skewed values); False interleaves the raw low bits (right
    for already-dense small ints)."""
    if normalize:
        keys = [rank_normalize(df, c, bits) for c in cols]
    else:
        keys = [F.col(c) for c in cols]
    z = interleave_bits(keys, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per data file, from parquet footers only."""
    import pyarrow.parquet as pq

    out = []
    for p in sorted(Path(path).glob("*.parquet")) or sorted(Path(path).glob("part-*")):
        md = pq.ParquetFile(str(p)).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def file_pruning_stats(path: str, box: dict[str, tuple]) -> dict[str, int]:
    """How many files would a conjunctive box predicate touch?

    ``box`` maps column → (lo, hi). A file survives pruning iff its
    [min, max] overlaps the box on EVERY column — exactly the footer-stats
    test a parquet reader applies. Returns {"n_files", "n_touched"}."""
    per_col = {c: file_minmax(path, c) for c in box}
    n_files = len(next(iter(per_col.values())))
    touched = 0
    for i in range(n_files):
        hit = all(
            not (per_col[c][i][1] < lo or per_col[c][i][0] > hi)
            for c, (lo, hi) in box.items()
        )
        touched += hit
    return {"n_files": n_files, "n_touched": touched}
