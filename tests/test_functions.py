from pyspark.sql import functions as F

from etl_for_dumdums_spark.functions import (
    clean_html,
    count_distinct_if,
    safe_divide,
    ts_diff_hours,
    week_start,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_clean_html_strips_tags_and_entities(spark):
    raw = "<p>Hello &amp; welcome to  <b>Spark</b>&nbsp;&lt;fast&gt;</p>"
    assert _one(spark, clean_html(F.lit(raw))) == 'Hello & welcome to Spark <fast>'


def test_clean_html_collapses_whitespace(spark):
    assert _one(spark, clean_html(F.lit("  a\n\n b\tc  "))) == "a b c"


def test_safe_divide_null_on_zero(spark):
    assert _one(spark, safe_divide(F.lit(10.0), F.lit(0.0))) is None
    assert _one(spark, safe_divide(F.lit(10.0), F.lit(4.0))) == 2.5


def test_week_start_is_monday(spark):
    # 2024-01-17 is a Wednesday; its Monday is 2024-01-15
    got = _one(spark, week_start(F.lit("2024-01-17 10:30:00").cast("timestamp")))
    assert str(got) == "2024-01-15"
    # a Monday truncates to itself
    got = _one(spark, week_start(F.lit("2024-01-15 00:00:00").cast("timestamp")))
    assert str(got) == "2024-01-15"


def test_ts_diff_hours_truncates_toward_zero(spark):
    end = F.lit("2024-01-01 10:59:00").cast("timestamp")
    start = F.lit("2024-01-01 09:00:00").cast("timestamp")
    assert _one(spark, ts_diff_hours(end, start)) == 1


def test_count_distinct_if(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "b"), (3, "b")], ["k", "g"]
    )
    got = df.agg(count_distinct_if(F.col("g") == "a", F.col("k")).alias("n")).collect()[0]["n"]
    assert got == 2
