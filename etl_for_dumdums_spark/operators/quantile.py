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


def exact_quantiles_cents(df: DataFrame, value_col: str, qs) -> list[float]:
    """Exact linear-interpolated quantiles for SEVERAL q at once, with the
    same constant-memory counting selection — but all order statistics
    bisect in LOCKSTEP: each iteration issues ONE scan whose aggregate
    carries a conditional count per still-active probe, so the scan count
    is log2(domain), not qs x order-stats x log2(domain). At 600M rows
    that turned the 1000x oracle sweep's per-q loop (~100 scans) into
    ~25 shared scans (r7; the DuckDB twin got the same single-pass
    treatment via list-argument quantile_cont)."""
    qs = list(qs)
    cents = (F.round(F.col(value_col) * 100)).cast("long")
    cdf = df.select(cents.alias("c"))
    stats = cdf.agg(
        F.count("*").alias("n"), F.min("c").alias("lo"), F.max("c").alias("hi")
    ).collect()[0]
    n, glo, ghi = stats["n"], stats["lo"], stats["hi"]
    if n == 0:
        return [math.nan] * len(qs)
    # every order statistic any quantile needs: floor rank + ceil rank
    ranks: dict[float, tuple[int, float]] = {}
    ks: set[int] = set()
    for q in qs:
        h = (n - 1) * q + 1
        k_lo = int(math.floor(h))
        frac = h - k_lo
        ranks[q] = (k_lo, frac)
        ks.add(k_lo)
        if frac != 0.0 and k_lo < n:
            ks.add(k_lo + 1)
    bounds = {k: [glo, ghi] for k in ks}
    while True:
        active = [k for k, (lo, hi) in bounds.items() if lo < hi]
        if not active:
            break
        mids = {k: (bounds[k][0] + bounds[k][1]) // 2 for k in active}
        row = cdf.agg(
            *[
                F.count(F.when(F.col("c") <= mids[k], 1)).alias(f"k{k}")
                for k in active
            ]
        ).collect()[0]
        for k in active:
            if row[f"k{k}"] >= k:
                bounds[k][1] = mids[k]
            else:
                bounds[k][0] = mids[k] + 1
    kth = {k: bounds[k][0] for k in ks}
    out = []
    for q in qs:
        k_lo, frac = ranks[q]
        v_lo = kth[k_lo]
        if frac == 0.0 or k_lo >= n:
            out.append(v_lo / 100.0)
        else:
            out.append((v_lo + frac * (kth[k_lo + 1] - v_lo)) / 100.0)
    return out


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
