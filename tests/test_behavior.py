"""Semantic properties of the behavioral operators (catalog/behavior.py and
the Gopher repetition filter) that the value-hash oracle can't express:
funnel monotonicity, cohort identities, SCD2 interval conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_dumdums_spark.catalog import load_all
from etl_for_dumdums_spark.catalog.behavior import (
    events_cohort_retention,
    events_funnel_steps,
    scd2_intervals,
)
from etl_for_dumdums_spark.catalog.textops import text_repetition_gopher

from .conftest import SF_SMOKE

load_all()


def _events(spark):
    from etl_for_dumdums_spark.catalog import Tables

    return Tables(spark, SF_SMOKE).events


def test_funnel_steps_monotonic(spark):
    row = events_funnel_steps(spark, SF_SMOKE).collect()[0]
    assert (
        row.n_users
        >= row.n_signup
        >= row.n_signup_view
        >= row.n_signup_view_click
        >= row.n_full_funnel
        >= 0
    )
    assert row.n_signup > 0  # non-vacuous at the smoke SF
    for col in ("pct_s1_to_s2", "pct_s2_to_s3", "pct_s3_to_s4", "pct_overall"):
        v = row[col]
        assert v is None or 0.0 <= v <= 100.0


def test_cohort_offset_zero_is_full_cohort(spark):
    rows = events_cohort_retention(spark, SF_SMOKE).collect()
    assert rows, "cohort output empty"
    zero = [r for r in rows if r.week_offset == 0]
    assert zero, "no offset-0 rows"
    for r in zero:
        # every user is active on their own cohort day
        assert r.n_active_users == r.cohort_size
        assert r.retention_pct == 100.0
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.n_active_users <= r.cohort_size


def test_scd2_conservation(spark):
    ev = _events(spark)
    out = scd2_intervals(spark, SF_SMOKE)
    rows = out.collect()
    total_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_events for r in rows) == total_events
    # exactly one open (current) interval per user
    assert sum(r.n_current for r in rows) == n_users
    for r in rows:
        assert r.n_intervals == r.n_closed + r.n_current
        assert r.avg_closed_duration_sec is None or r.avg_closed_duration_sec >= 0.0


def test_gopher_buckets_partition_corpus(spark):
    from etl_for_dumdums_spark.catalog import Tables

    docs = Tables(spark, SF_SMOKE).documents
    out = text_repetition_gopher(spark, SF_SMOKE).collect()
    allowed = {"top_word_heavy", "top_bigram_heavy", "dup_word_heavy", "ok"}
    assert {r.repetition_bucket for r in out} <= allowed
    assert sum(r.n_docs for r in out) == docs.count()
    for r in out:
        for col in ("corpus_top_word_frac", "corpus_top_bigram_frac", "corpus_dup_word_frac"):
            v = r[col]
            assert v is None or 0.0 <= v <= 1.0


def test_funnel_single_shuffle_plan(spark):
    """The funnel must shuffle events once: chained window minima reuse the
    user_id partitioning (no join, no second Exchange over events)."""
    plan = events_funnel_steps(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one hash exchange for the user_id windows; final agg is a single-partition
    # exchange, not a hash repartition of the events table
    assert n_exchanges == 1, f"expected 1 hash exchange, got {n_exchanges}:\n{plan[:2000]}"


def test_tfidf_equals_reference_window_and_group_limits_map_side(spark):
    """text_tfidf_topterms must return exactly the reference plain-window
    top-k, and its rank filter must compile to a WindowGroupLimit with a
    Partial stage (map-side per-language prune before the lang exchange)."""
    from pyspark.sql import Window as W

    from etl_for_dumdums_spark.catalog import Tables
    from etl_for_dumdums_spark.catalog.textops import text_tfidf_topterms

    t = Tables(spark, SF_SMOKE)
    words = t.documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
        ).alias("w"),
    )
    stats = words.groupBy("lang", F.col("w").alias("term")).agg(
        F.count("*").alias("tf"), F.count_distinct("doc_id").alias("df")
    )
    sizes = t.documents.groupBy("lang").agg(F.count("*").alias("n_docs_lang"))
    scored = stats.join(sizes, "lang").withColumn(
        "score", F.col("tf") * F.col("n_docs_lang") * 1.0 / F.col("df")
    )
    wglobal = W.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    plain = (
        scored.withColumn("rn", F.row_number().over(wglobal))
        .filter(F.col("rn") <= 10)
        .select("lang", "term", "rn")
        .collect()
    )
    q = text_tfidf_topterms(spark, SF_SMOKE)
    got = q.select("lang", "term", "rn").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, plain))
    assert len(got) > 0
    phys = q._jdf.queryExecution().executedPlan().toString()
    assert phys.count("WindowGroupLimit") >= 2, "map-side group-limit missing"
