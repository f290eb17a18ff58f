"""Pins for the round-9 optimization rewrites.

Each rewrite here changed an operator's PLAN, never its VALUES — these
tests pin the value equivalence against the original formulation (the
form the oracle has matched since the query landed) on real testdata plus
synthetic edge cases.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_for_dumdums_spark.catalog import Tables, load_all  # noqa: E402

load_all()

from etl_for_dumdums_spark.catalog import QUERIES  # noqa: E402
from etl_for_dumdums_spark.catalog.aggregations import (  # noqa: E402
    _orderstat_percentiles,
)


@pytest.fixture(scope="module")
def spark():
    from etl_for_dumdums_spark.session import get_spark

    s = get_spark("test_optimization_r09")
    yield s


# ---------------------------------------------------------------------------
# agg_global_summary: the histogram order-statistics percentiles must equal
# Spark's exact Percentile aggregate bit-for-bit (same interpolation
# formula, same double reconstruction) — and the split aggregation must
# reproduce the original single-agg row exactly.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_agg_global_summary_matches_original_single_agg(spark, sf):
    d = f"/root/testdata/{sf}"
    t = Tables(spark, d)
    old = t.lineitem.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price"),
    ).collect()[0]
    new = QUERIES["agg_global_summary"](spark, d).collect()[0]
    assert old.asDict() == new.asDict()


# ---------------------------------------------------------------------------
# join_range_interval: the RANGE-frame window form (home row + lookahead
# copy in the preceding bucket) must equal the original bucketed
# equi-join + residual-filter form row-for-row.
# ---------------------------------------------------------------------------
def _range_interval_join_form(events):
    """The pre-r9 formulation: bucketed equi-join, pair filter, groupBy."""
    from etl_for_dumdums_spark.catalog.joins import _RANGE_BUCKET_SEC, DP

    e = events.select("event_id", "event_type", "ts")
    bkt = F.floor(F.unix_timestamp("ts") / _RANGE_BUCKET_SEC)
    left = e.select(
        "event_id", "event_type", "ts",
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    right = e.select(
        F.col("event_id").alias("nid"),
        F.col("event_type").alias("event_type"),
        F.col("ts").alias("nts"),
        bkt.alias("bkt"),
    )
    pairs = left.join(right, ["event_type", "bkt"]).filter(
        (F.col("nts") > F.col("ts"))
        & (F.col("nts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    follows = pairs.groupBy("event_id").agg(F.count("*").alias("n_follow"))
    per_event = e.join(follows, "event_id", "left").select(
        "event_type", F.coalesce("n_follow", F.lit(0)).alias("n_follow")
    )
    return (
        per_event.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("n_follow"), DP).alias("avg_follows"),
            F.max("n_follow").alias("max_follows"),
            F.sum("n_follow").cast("bigint").alias("total_pairs"),
        )
        .orderBy("event_type")
    )


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_range_interval_window_matches_join_form(spark, sf):
    from etl_for_dumdums_spark.catalog.joins import _range_interval

    t = Tables(spark, f"/root/testdata/{sf}")
    old = [r.asDict() for r in _range_interval_join_form(t.events).collect()]
    new = [r.asDict() for r in _range_interval(t.events).collect()]
    assert old == new


def test_range_interval_window_edge_cases(spark):
    """Synthetic events covering the equivalence argument's edges: equal
    timestamps (strictly-after excludes the peer), a follower exactly 1h
    later (inclusive), 1h+1us later (excluded), followers in the home
    bucket vs the next bucket, and an event at an exact bucket boundary."""
    from datetime import datetime, timedelta

    from etl_for_dumdums_spark.catalog.joins import _range_interval

    base = datetime(2024, 3, 1, 10, 30, 0)
    bound = datetime(2024, 3, 1, 12, 0, 0)  # exact bucket boundary
    rows = [
        ("a", 1, base),
        ("a", 2, base),                                   # equal ts peer
        ("a", 3, base + timedelta(minutes=10)),           # home bucket
        ("a", 4, base + timedelta(minutes=45)),           # next bucket
        ("a", 5, base + timedelta(hours=1)),              # exactly 1h: included
        ("a", 6, base + timedelta(hours=1, microseconds=1)),  # 1h+1us: excluded
        ("a", 7, bound),                                  # boundary event
        ("a", 8, bound + timedelta(microseconds=1)),
        ("b", 9, base),                                   # other type: isolated
    ]
    events = spark.createDataFrame(
        [(t_, i, ts) for t_, i, ts in rows],
        "event_type string, event_id int, ts timestamp",
    )
    old = [r.asDict() for r in _range_interval_join_form(events).collect()]
    new = [r.asDict() for r in _range_interval(events).collect()]
    assert old == new
    # spot-check the hand-computed counts survive both forms
    by_type = {r["event_type"]: r for r in new}
    # event 1 follows: 3,4,5 (not 2 equal-ts, not 6 >1h) = 3; event 2 same;
    # 3 -> 4,5,6; 4 -> 5,6,7,8; 5 -> 6,7,8; 6 -> 7,8; 7 -> 8; 8 -> 0
    assert by_type["a"]["total_pairs"] == 3 + 3 + 3 + 4 + 3 + 2 + 1 + 0
    assert by_type["b"]["total_pairs"] == 0


# ---------------------------------------------------------------------------
# dedup_simhash64: the integer-half vote aggregates (conv of md5 hex chars
# 1-8 / 9-16 to two 32-bit ints + bit shifts) must equal the original
# per-bit substr+instr string probes for every one of the 64 bits.
# ---------------------------------------------------------------------------
def test_sh64_int_votes_match_string_votes(spark):
    from etl_for_dumdums_spark.catalog.dedup import (
        _sh64_int_vote_exprs,
        _sh64_vote_exprs,
        _tokens,
    )
    from etl_for_dumdums_spark.catalog import Tables

    tok = _tokens(Tables(spark, "/root/testdata/sf0.001").documents)
    old = tok.groupBy("doc_id").agg(
        *[
            F.expr(e.replace("strpos", "instr").replace("//", "div"))
            for e in _sh64_vote_exprs("strpos", "//")
        ]
    )
    new = tok.select(
        "doc_id",
        F.expr("CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)").alias("ha"),
        F.expr("CAST(conv(substr(md5(w), 9, 8), 16, 10) AS BIGINT)").alias("hb"),
    ).groupBy("doc_id").agg(*[F.expr(e) for e in _sh64_int_vote_exprs()])
    o = {r["doc_id"]: r.asDict() for r in old.collect()}
    n = {r["doc_id"]: r.asDict() for r in new.collect()}
    assert o == n


# ---------------------------------------------------------------------------
# corpus_clean_report: the single-evaluation stage composition (gate ->
# exact -> fingerprint -> minhash, each built once and cached) must equal
# the original formulation that called clean_corpus per branch.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_corpus_report_matches_clean_corpus_composition(spark, sf):
    from etl_for_dumdums_spark.catalog import EXTRA_QUERIES
    from etl_for_dumdums_spark.operators.corpus import clean_corpus

    d = f"/root/testdata/{sf}"
    docs = Tables(spark, d).documents
    got = EXTRA_QUERIES["corpus_clean_report"](spark, d).collect()[0].asDict()
    n_fp = clean_corpus(docs).count()
    n_kept = clean_corpus(docs, minhash_neardup=True).count()
    assert got["n_after_fingerprint"] == n_fp
    assert got["n_kept"] == n_kept
    assert got["n_dropped"] == got["n_raw"] - n_kept


# ---------------------------------------------------------------------------
# text_winnow_sketch: the two-pass per-lang rollup (one (lang, h) rollup for
# hash stats + one distinct-doc pass) must equal the original three-branch
# formulation (per-doc sizes, count_distinct(h), shared-hash subquery).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_winnow_sketch_two_pass_matches_three_branch(spark, sf):
    from etl_for_dumdums_spark.catalog.textops import _winnow_sketch, R

    docs = Tables(spark, f"/root/testdata/{sf}").documents
    new = [r.asDict() for r in _winnow_sketch(docs).collect()]

    # original formulation, reconstructed over the same sketch definition
    from pyspark.sql import Window as W
    from etl_for_dumdums_spark.catalog.textops import (
        _WINNOW_K,
        _WINNOW_W,
        _hex15_to_long_spark,
    )

    norm = docs.select(
        "doc_id", "lang",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    pos = (
        norm.filter(F.length("t") >= _WINNOW_K + _WINNOW_W - 1)
        .select(
            "doc_id", "lang", "t",
            F.explode(F.sequence(F.lit(1), F.length("t") - (_WINNOW_K - 1))).alias("i"),
        )
    )
    hashed = pos.select(
        "doc_id", "lang", "i",
        F.expr(_hex15_to_long_spark(f"substring(t, i, {_WINNOW_K})")).alias("h"),
    )
    wspec = W.partitionBy("doc_id").orderBy("i")
    sketch = (
        hashed.select(
            "doc_id", "lang",
            F.min("h").over(wspec.rowsBetween(0, _WINNOW_W - 1)).alias("sel"),
            F.lead("i", _WINNOW_W - 1).over(wspec).alias("full_i"),
        )
        .filter(F.col("full_i").isNotNull())
        .select("doc_id", "lang", F.col("sel").alias("h"))
        .distinct()
    )
    sizes = sketch.groupBy("doc_id", "lang").agg(F.count("*").alias("sk"))
    per_lang = sizes.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("sk").alias("total_sketch_hashes"),
        R(F.sum("sk") * 1.0 / F.count("*")).alias("avg_sketch_size"),
    )
    distinct_hashes = sketch.groupBy("lang").agg(
        F.count_distinct("h").alias("n_distinct_hashes")
    )
    shared = (
        sketch.groupBy("lang", "h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .groupBy("lang")
        .agg(F.count("*").alias("n_shared_hashes"))
    )
    old = [
        r.asDict()
        for r in per_lang.join(distinct_hashes, "lang", "left")
        .join(shared, "lang", "left")
        .select(
            "lang", "n_docs", "total_sketch_hashes", "avg_sketch_size",
            "n_distinct_hashes",
            F.coalesce("n_shared_hashes", F.lit(0)).alias("n_shared_hashes"),
        )
        .orderBy("lang")
        .collect()
    ]
    assert old == new


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard: the 60-bit md5-fold shingle fingerprint form must
# equal the raw-string form — the fold is injective on these corpora, and
# every downstream count (DF cap, sizes, intersections, jaccard bins)
# depends on the shingle only through equality.
# ---------------------------------------------------------------------------
def _ngram_jaccard_string_form(documents):
    """The pre-r9 formulation: raw trigram strings end to end."""
    from pyspark.sql import Window as _W

    from etl_for_dumdums_spark.catalog.dedup import _MAX_SHINGLE_DF

    arr = documents.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("a")
    ).filter(F.size("a") >= 3)
    sh0 = arr.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(a) - 3), i -> concat_ws(' ', a[i], a[i+1], a[i+2]))")
        ).alias("shingle"),
    ).distinct()
    sh = (
        sh0.withColumn("df", F.count("*").over(_W.partitionBy("shingle")))
        .filter(F.col("df") <= _MAX_SHINGLE_DF)
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    x, y = sh.alias("x"), sh.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .agg(F.count("*").alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        pairs.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select(
            F.round(
                F.col("common") * 1.0 / (F.col("sa.sz") + F.col("sb.sz") - F.col("common")), 1
            ).alias("jaccard_bin")
        )
        .groupBy("jaccard_bin")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("jaccard_bin").desc())
    )


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_ngram_jaccard_fingerprint_matches_string_form(spark, sf):
    d = f"/root/testdata/{sf}"
    t = Tables(spark, d)
    old = [r.asDict() for r in _ngram_jaccard_string_form(t.documents).collect()]
    new = [r.asDict() for r in QUERIES["dedup_ngram_jaccard"](spark, d).collect()]
    spark.catalog.clearCache()
    assert old == new


def test_orderstat_percentiles_interpolation_edges(spark):
    """Synthetic 2-decimal data covering the interpolation branches:
    lower == higher (pos lands on a value), true interpolation between two
    distinct cents, duplicated values, and a single-row frame."""
    cases = [
        # 4 values: p50 pos = 1.5 -> interpolate between idx 1 and 2
        [1.25, 3.50, 3.75, 10.00],
        # 5 values: p50 pos = 2.0 -> lower == higher branch
        [0.01, 0.02, 0.03, 0.04, 100.99],
        # heavy duplication: one histogram row covers many positions
        [2.50] * 7 + [9.99] * 3,
        # single row
        [42.42],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        expected = df.agg(
            F.round(F.percentile("x", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("x", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("x", F.lit(0.99)), 4).alias("p99"),
        ).collect()[0]
        got = _orderstat_percentiles(
            df, "x", [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ).collect()[0]
        assert expected.asDict() == got.asDict(), vals
