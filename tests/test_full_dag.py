"""End-to-end `dbt build` equivalent: every model family built in one
topologically-ordered run over reference-shaped raw parquet, with the
dbt-style data-quality checks applied to the resulting marts."""

import datetime as dt

import pytest

from etl_for_dumdums_spark.checks import accepted_values, not_null, unique
from etl_for_dumdums_spark.models.full_dag import build_full_dag
from etl_for_dumdums_spark.schema import RAW_SCHEMAS

from . import fixtures as fx

NOW = dt.datetime(2024, 3, 15, 12, 0, 0)


@pytest.fixture(scope="module")
def raw_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("full")
    lu, gu, cy, li, pr, rv, cm = fx.gen_linear_github()
    sl, rd, ac, ss = fx.gen_oura()
    data = {
        "linear_users": (lu, "linear.raw_users"),
        "github_users": (gu, "github.raw_users"),
        "linear_cycles": (cy, "linear.raw_cycles"),
        "linear_issues": (li, "linear.raw_issues"),
        "github_prs": (pr, "github.raw_pull_requests"),
        "github_reviews": (rv, "github.raw_pr_reviews"),
        "github_comments": (cm, "github.raw_pr_comments"),
        "oura_sleep": (sl, "oura.raw_sleep"),
        "oura_readiness": (rd, "oura.raw_daily_readiness"),
        "oura_activity": (ac, "oura.raw_daily_activity"),
        "oura_sessions": (ss, "oura.raw_sleep_sessions"),
        "hn_stories": (fx.gen_hn_stories(), "hacker_news.raw_stories"),
        "hn_comments": (fx.gen_hn_comments(), "hacker_news.raw_comments"),
        "stock_prices": (fx.gen_stock_prices(), "stocks.raw_prices"),
        "trends_interest": (fx.gen_trends(), "trends.raw_interest_over_time"),
        "iowa_sales": (fx.gen_iowa_sales(), "iowa_liquor.raw_sales"),
        "fda_events": (fx.gen_fda_events(), "fda_food.raw_food_events"),
        "fda_recalls": (fx.gen_fda_recalls(), "fda_food.raw_recalls"),
    }
    paths = {}
    for name, (rows, schema) in data.items():
        path = str(base / name)
        spark.createDataFrame(rows, RAW_SCHEMAS[schema]).write.parquet(path)
        paths[name] = path
    return paths


def test_full_dag_builds_all_marts(spark, raw_paths, tmp_path):
    reg = build_full_dag(raw_paths, NOW, mart_dir=str(tmp_path))
    built = reg.build(spark)

    marts = [
        "dim_users",
        "fct_issues",
        "fct_pull_requests",
        "fct_reviewer_activity",
        "fct_oura_daily",
        "fct_hn_weekly_stats",
        "fct_hn_keyword_trends",
        "fct_hn_domain_stats",
        "fct_stock_prices",
        "fct_sector_performance",
        "fct_keyword_trends",
        "fct_sales_monthly",
        "fct_sales_by_county",
        "fct_top_vendors",
        "fct_events_by_reaction",
        "fct_events_by_gender",
        "fct_events_monthly",
        "fct_events_by_product",
        "fct_recalls_by_state",
        "fct_recalls_by_topic",
        "fct_hn_keyword_sentiment",
    ]
    for m in marts:
        assert m in built, f"{m} missing from DAG build"
        assert built[m].count() > 0, f"{m} is empty"

    # dependency ordering held
    order = reg.topo_order()
    assert order.index("stg_food_events") < order.index("fct_events_by_gender")
    assert order.index("fct_stock_prices") < order.index("fct_sector_performance")

    # table materialization produced parquet
    assert (tmp_path / "fct_stock_prices").exists()


def test_dbt_style_checks_on_built_marts(spark, raw_paths):
    reg = build_full_dag(raw_paths, NOW)
    built = reg.build(spark)

    assert unique(built["fct_issues"], "issue_id").passed
    assert not_null(built["fct_issues"], "issue_id").passed
    assert accepted_values(
        built["fct_stock_prices"], "ma_trend", ["uptrend", "downtrend"]
    ).passed
    assert accepted_values(
        built["fct_oura_daily"],
        "wellness_category",
        ["excellent", "good", "fair", "poor", "unknown"],
    ).passed
    # approval_count <= review_count (dbt expression_is_true)
    from etl_for_dumdums_spark.checks import expression_is_true

    assert expression_is_true(
        built["fct_pull_requests"], "approval_count <= review_count"
    ).passed
