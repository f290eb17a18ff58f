"""Spark 4 native surfaces (catalog/native4.py) — plan pins + the
DataSketches HLL properties that no SQL oracle can restate."""

from pyspark.sql import functions as F

from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, Tables, load_all

from .conftest import SF_SMOKE

load_all()
ALL_Q = {**QUERIES, **EXTRA_QUERIES}

SF_01 = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# lateralJoin decorrelation: the correlated ORDER BY + LIMIT 2 must compile
# to WindowGroupLimit (map-side partial prune BEFORE the shuffle) + a hash
# join — never a nested-loop / cartesian per outer row. This is the property
# that makes lateralJoin usable at 100 TB.
# ---------------------------------------------------------------------------
def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    plan = _plan(ALL_Q["join_lateral_topk"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial group-limit runs before the exchange: it must appear at least
    # twice (Partial + Final)
    assert plan.count("WindowGroupLimit") >= 2


def test_lateral_topk_values(spark):
    rows = ALL_Q["join_lateral_topk"](spark, SF_SMOKE).collect()
    per_nation: dict[str, list] = {}
    for r in rows:
        per_nation.setdefault(r.nation, []).append(r)
    sup = Tables(spark, SF_SMOKE).supplier
    nat = Tables(spark, SF_SMOKE).nation
    expect = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .select("n_name", "s_suppkey", "s_acctbal")
        .collect()
    )
    brute: dict[str, list] = {}
    for r in expect:
        brute.setdefault(r.n_name, []).append(r)
    for n_name, members in brute.items():
        top = sorted(members, key=lambda r: (-r.s_acctbal, r.s_suppkey))[:2]
        got = per_nation.get(n_name, [])
        assert [r.s_suppkey for r in got] == sorted(r.s_suppkey for r in top)


# ---------------------------------------------------------------------------
# VARIANT: typed path extraction semantics, incl. the missing-path null.
# ---------------------------------------------------------------------------
def test_variant_typed_paths_and_missing(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": [10, 20]}, "s": "x"}',), ('{"a": 2}',)], ["js"]
    ).select(F.parse_json("js").alias("v"))
    out = df.select(
        F.variant_get("v", "$.a", "bigint").alias("a"),
        F.try_variant_get("v", "$.b.c[1]", "bigint").alias("c1"),
        F.try_variant_get("v", "$.s", "string").alias("s"),
        F.try_variant_get("v", "$.missing", "bigint").alias("m"),
    ).collect()
    assert [(r.a, r.c1, r.s, r.m) for r in out] == [(1, 20, "x", None), (2, None, None, None)]


def test_variant_query_parses_once_below_the_agg(spark):
    """The VARIANT parse must be pre-projected below the aggregate so it runs
    once per row, not once per referencing aggregate input (the
    scalar_json_extract 3x-reparse lesson)."""
    plan = _plan(ALL_Q["scalar_variant_json"](spark, SF_SMOKE))
    # the physical plan spells it VariantExpressionEvalUtils.parseJson(...)
    assert plan.count("parseJson") == 1


# ---------------------------------------------------------------------------
# transpose: new columns are the index values sorted ascending, regardless of
# input row order.
# ---------------------------------------------------------------------------
def test_transpose_sorts_new_columns(spark):
    agg = (
        Tables(spark, SF_SMOKE)
        .events.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("event_type").desc())
    )
    cols = agg.transpose().columns
    assert cols[0] == "key"
    assert cols[1:] == sorted(cols[1:])


# ---------------------------------------------------------------------------
# listagg: pre-bounded input (row_number <= 8 BEFORE the agg) — per-group
# state never exceeds 8 names.
# ---------------------------------------------------------------------------
def test_listagg_bounded_and_ordered(spark):
    rows = ALL_Q["agg_listagg_ordered"](spark, SF_01).collect()
    assert rows, "no segments"
    for r in rows:
        names = r.top_names.split(",")
        assert len(names) == r.n_listed <= 8


def test_listagg_prefilters_before_aggregation(spark):
    plan = _plan(ALL_Q["agg_listagg_ordered"](spark, SF_SMOKE))
    # the row_number window (with its rn <= 8 filter) must sit below listagg:
    # plan order is bottom-up in toString, so the Window node appears after
    # (deeper than) the ObjectHashAggregate that computes listagg
    agg_pos = plan.find("listagg")
    win_pos = plan.find("row_number()")
    assert agg_pos != -1 and win_pos != -1
    assert win_pos > agg_pos, "row_number cap must be below (deeper than) the listagg"


# ---------------------------------------------------------------------------
# SQL UDF: Catalyst inlines the function body — no UDF evaluation node ever
# reaches the physical plan, so codegen and pushdown are unaffected.
# ---------------------------------------------------------------------------
def test_sql_udf_is_inlined(spark):
    df = ALL_Q["scalar_sql_udf_tiers"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the inlined CASE branches appear as plain expressions
    assert "platinum" in plan
    rows = {(r.c_mktsegment, r.tier): r.n for r in df.collect()}
    assert rows and all(n > 0 for n in rows.values())


# ---------------------------------------------------------------------------
# DataSketches HLL: deterministic, mergeable, bounded-error — pinned here
# because no SQL engine can restate the DataSketches estimate (same policy
# as text_compression_ratio's zlib values).
# ---------------------------------------------------------------------------
def test_hll_sketch_union_equals_direct_and_bounds_error(spark):
    ev = Tables(spark, SF_01).events
    lg_k = F.lit(14)
    per_type = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id", lg_k).alias("sk"))
    union_est = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    direct_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", lg_k)).alias("est")
    ).collect()[0].est
    exact = ev.select("user_id").distinct().count()
    # mergeability: unioning per-group sketches == sketching the whole column
    assert union_est == direct_est
    # bounded error: lgK=14 gives ~0.8% relative standard error
    assert abs(union_est - exact) <= max(2, 0.05 * exact)
    # determinism: a second run yields the identical estimate
    again = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", lg_k)).alias("est")
    ).collect()[0].est
    assert again == direct_est
