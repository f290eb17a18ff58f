"""Distributed EXACT quantiles by iterative range counting.

Spark's exact ``percentile`` aggregate buffers every value of a group in one
aggregation buffer — fine at test SF, an OOM at 100 TB. The scale-true
exact algorithm is selection by counting: binary-search the value domain,
counting rows below the probe with a full scan per iteration. log2(domain)
iterations × O(n) counting, constant memory per task, no sort, no buffer.

For k-th smallest of n doubles we search on the ORDER STATISTIC directly:
probe a value, count how many rows are <= it, narrow. Terminates because
the candidate set shrinks monotonically; on 2-decimal money columns the
domain is integer cents, so the search is exact integer bisection.

``exact_quantile_cents`` returns the same linear-interpolated quantile as
``F.percentile`` / DuckDB ``quantile_cont`` (pinned by test): it selects
the floor/ceil order statistics with two bisections and interpolates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kth_smallest_cents(df: DataFrame, col: str, k: int, lo: int, hi: int) -> int:
    """k-th smallest (1-based) of an integer-cents column via bisection.

    Each iteration is one count aggregation (a full scan — at cluster scale
    the scan is parallel and the driver sees one number). At most
    log2(hi-lo) iterations.
    """
    while lo < hi:
        mid = (lo + hi) // 2
        n_le = df.filter(F.col(col) <= mid).count()
        if n_le >= k:
            hi = mid
        else:
            lo = mid + 1
    return lo


def exact_quantile_cents(df: DataFrame, value_col: str, q: float) -> float:
    """Exact linear-interpolated quantile of a 2-decimal money column,
    computed with constant executor memory (iterative counting selection).

    Equals ``F.percentile(value_col, q)`` bit-for-bit on 2-decimal data
    (both interpolate between the same two integer-cent order statistics).
    """
    cents = (F.round(F.col(value_col) * 100)).cast("long")
    cdf = df.select(cents.alias("c"))
    stats = cdf.agg(
        F.count("*").alias("n"), F.min("c").alias("lo"), F.max("c").alias("hi")
    ).collect()[0]
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if n == 0:
        return math.nan
    # continuous-quantile rank: h = (n-1)q + 1 (1-based), interpolate
    h = (n - 1) * q + 1
    k_lo = int(math.floor(h))
    frac = h - k_lo
    v_lo = _kth_smallest_cents(cdf, "c", k_lo, lo, hi)
    if frac == 0.0 or k_lo >= n:
        return v_lo / 100.0
    v_hi = _kth_smallest_cents(cdf, "c", k_lo + 1, v_lo, hi)
    # interpolate exactly as percentile/quantile_cont: lo + frac*(hi-lo)
    return (v_lo + frac * (v_hi - v_lo)) / 100.0
