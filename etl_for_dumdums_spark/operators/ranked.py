"""Global rank + prefix sums over a total order, without a global sort window.

A ``row_number() OVER (ORDER BY ...)`` (or a running ``SUM``) with no
PARTITION BY funnels the entire table through ONE task — the
single-partition-window scale killer. This module generalizes the trick
win_ntile_deciles / customer_rfm_segments / pack_token_shards already use:

  1. ``repartitionByRange`` on the total order (Spark samples range bounds,
     so partitions are balanced);
  2. per-partition ``row_number`` / running ``SUM`` (each partition sorts
     locally — parallel, spillable);
  3. collect ONE tiny aggregate row per partition (``nparts`` rows — the
     documented tiny-by-construction collect) and broadcast the exclusive
     prefix offsets back;
  4. global rank / prefix sum = local value + partition offset.

Bit-identical to the serial window at any scale. Callers must pass a total
order (``order_cols`` must break all ties) or per-partition row numbering is
nondeterministic.

Consumers: stats_ks_mannwhitney (cumulative sample counts),
agg_gini_concentration (rank-weighted revenue sums), and any future exact
order-statistic operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def ranged_prefix(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    nparts: int = 32,
) -> tuple[DataFrame, dict[str, int]]:
    """Attach a global 1-based rank ``_r`` and, for each ``c`` in
    ``sum_cols``, an inclusive prefix sum ``cum_<c>`` over the total order
    ``order_cols``. Returns ``(out_df, totals)`` where ``totals`` maps
    ``"_n"`` to the row count and each sum col to its grand total (exact
    Python ints — handy as literals for closed-form expressions).

    ``sum_cols`` must be integer-typed; prefix sums are exact BIGINT.
    The returned frame is cached (it is consumed at least twice: once for
    the offset collect, once downstream) and stays pinned for the life of
    the returned DataFrame: the offsets were collected from ONE evaluation
    of the range partitioning, so the downstream consumer must see that
    same evaluation. Callers running many queries in one session should
    ``spark.catalog.clearCache()`` (or ``.unpersist()`` the result's
    lineage) after their terminal action — bench.py and
    tools/check_oracle.py both do.
    """
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    aggs = [F.count("*").alias("_n")] + [
        F.sum(c).cast("long").alias(f"_s_{c}") for c in sum_cols
    ]
    part = {r["_pid"]: r for r in ranged.groupBy("_pid").agg(*aggs).collect()}
    acc_n, acc = 0, {c: 0 for c in sum_cols}
    offsets = []
    for pid in sorted(part):
        offsets.append(tuple([pid, acc_n] + [acc[c] for c in sum_cols]))
        acc_n += part[pid]["_n"]
        for c in sum_cols:
            acc[c] += part[pid][f"_s_{c}"] or 0
    schema = "_pid int, _off long" + "".join(f", _off_{c} long" for c in sum_cols)
    off_df = spark.createDataFrame(offsets, schema)
    wrn = W.partitionBy("_pid").orderBy(*order_cols)
    wcum = wrn.rowsBetween(W.unboundedPreceding, 0)
    out = ranged.join(F.broadcast(off_df), "_pid").withColumn(
        "_r", (F.col("_off") + F.row_number().over(wrn)).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}",
            (F.col(f"_off_{c}") + F.sum(c).over(wcum)).cast("long"),
        )
    drop = ["_pid", "_off"] + [f"_off_{c}" for c in sum_cols]
    totals: dict[str, int] = {"_n": acc_n, **{c: int(acc[c]) for c in sum_cols}}
    return out.drop(*drop), totals
