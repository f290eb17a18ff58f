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
    pins: list | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Attach a global 1-based rank ``_r`` and, for each ``c`` in
    ``sum_cols``, an inclusive prefix sum ``cum_<c>`` over the total order
    ``order_cols``. Returns ``(out_df, totals)`` where ``totals`` maps
    ``"_n"`` to the row count and each sum col to its grand total (exact
    Python ints — handy as literals for closed-form expressions).

    ``sum_cols`` must be integer-typed; prefix sums are exact BIGINT.

    Pinned-frame contract: the intermediate range-partitioned frame is
    cached (consumed twice: the offset collect here, and the downstream
    plan) and MUST stay pinned until the caller's terminal action — the
    offsets were collected from ONE evaluation of the (sampled, therefore
    nondeterministic) range partitioning, and an uncached re-evaluation
    could re-draw the bounds and misalign the offsets. Release it after
    the dependent action via either
      * ``pins``: pass a list and the pinned DataFrame is appended for the
        caller to ``.unpersist()`` when done (the library-caller path), or
      * ``spark.catalog.clearCache()`` between queries (what bench.py and
        tools/check_oracle.py do).
    """
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    if pins is not None:
        pins.append(ranged)
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
