"""The reference's staging layer as named, independently-buildable models.

One builder per dbt staging view (reference dbt/models/staging/**), each a
pure projection over its raw table — rename + light derivation only, exactly
like the reference's `select ... as ...` staging SQL — so the layer can be
materialized and checked on its own (dbt_project.yml:21-22 materializes
staging as views). Registered into the full DAG by models/full_dag.py.

Reference parity (file → builder):
  stg_linear__issues.sql:1-24        → stg_linear_issues
  stg_linear__users.sql              → stg_linear_users
  stg_linear__cycles.sql             → stg_linear_cycles
  stg_github__pull_requests.sql      → stg_github_pull_requests
  stg_github__users.sql              → stg_github_users
  stg_github__pr_reviews.sql         → stg_github_pr_reviews
  stg_github__pr_comments.sql        → stg_github_pr_comments
  stg_oura__sleep.sql                → stg_oura_sleep
  stg_oura__daily_readiness.sql      → stg_oura_daily_readiness
  stg_oura__daily_activity.sql       → stg_oura_daily_activity (W1 dedup)
  stg_oura__sleep_sessions.sql       → stg_oura_sleep_sessions
  stg_stocks__prices.sql             → stg_stocks_prices
  stg_trends__interest_over_time.sql → stg_trends_interest_over_time
  stg_iowa_liquor__sales.sql         → stg_iowa_liquor_sales
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stg_linear_issues(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("issue_id"),
        "identifier",
        "title",
        "state",
        "priority",
        "estimate",
        "assignee_id",
        "cycle_id",
        "project_name",
        "labels",
        "parent_id",
        "parent_identifier",
        "created_at",
        "updated_at",
    )


def stg_linear_users(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("user_id"),
        "email",
        "display_name",
        "name",
        F.col("active").alias("is_active"),
    )


def stg_linear_cycles(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("cycle_id"),
        F.col("number").alias("cycle_number"),
        F.col("name").alias("cycle_name"),
        "team_name",
        "starts_at",
        "ends_at",
    )


def stg_github_pull_requests(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("pull_request_id"),
        F.col("number").alias("pr_number"),
        "repo",
        "title",
        "state",
        F.col("merged").alias("is_merged"),
        F.col("draft").alias("is_draft"),
        "author_id",
        "created_at",
        "updated_at",
        "merged_at",
        "closed_at",
        F.coalesce("ready_for_review_at", "created_at").alias("ready_for_review_at"),
        "additions",
        "deletions",
        "changed_files",
    )


def stg_github_users(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("user_id"),
        F.col("login").alias("username"),
        "email",
        "name",
        "avatar_url",
    )


def stg_github_pr_reviews(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("review_id"),
        "pull_request_id",
        "repo",
        F.col("author_id").alias("reviewer_id"),
        F.col("state").alias("review_state"),
        "submitted_at",
        F.col("body").alias("review_body"),
    )


def stg_github_pr_comments(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("comment_id"),
        "pull_request_id",
        "repo",
        "author_id",
        "created_at",
        "updated_at",
        F.col("path").alias("file_path"),
        F.col("body").alias("comment_body"),
    )


_SLEEP_CONTRIBUTORS = (
    "deep_sleep",
    "efficiency",
    "latency",
    "rem_sleep",
    "restfulness",
    "timing",
    "total_sleep",
)


def stg_oura_sleep(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("sleep_id"),
        "day",
        F.col("score").alias("sleep_score"),
        *[f"contributor_{c}" for c in _SLEEP_CONTRIBUTORS],
    )


def stg_oura_daily_readiness(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("readiness_id"),
        *[c for c in raw.columns if c != "id"],
    )


def stg_oura_daily_activity(raw: DataFrame) -> DataFrame:
    # Oura can emit multiple records per day (timezone edges): keep the one
    # with the most steps (W1 dedup, stg_oura__daily_activity.sql:6-13)
    w = Window.partitionBy("day").orderBy(F.col("steps").desc(), F.col("id").desc())
    deduped = raw.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    minutes = {
        "high_activity_time": "high_activity_time_minutes",
        "medium_activity_time": "medium_activity_time_minutes",
        "low_activity_time": "low_activity_time_minutes",
        "sedentary_time": "sedentary_time_minutes",
        "resting_time": "resting_time_minutes",
    }
    return deduped.select(
        F.col("id").alias("activity_id"),
        "day",
        "score",
        "active_calories",
        "total_calories",
        "steps",
        "equivalent_walking_distance",
        *[(F.col(src) / 60).cast("long").alias(dst) for src, dst in minutes.items()],
        *[c for c in raw.columns if c.startswith("contributor_")],
    )


def stg_oura_sleep_sessions(raw: DataFrame) -> DataFrame:
    hours = lambda c: F.round(F.col(c) / 3600.0, 2)  # noqa: E731
    return raw.select(
        F.col("id").alias("sleep_session_id"),
        "day",
        "bedtime_start",
        "bedtime_end",
        "sleep_type",
        "total_sleep_duration_seconds",
        "time_in_bed_seconds",
        "awake_time_seconds",
        "light_sleep_duration_seconds",
        "deep_sleep_duration_seconds",
        "rem_sleep_duration_seconds",
        "latency_seconds",
        F.col("efficiency").alias("sleep_efficiency"),
        "average_heart_rate",
        "lowest_heart_rate",
        "average_hrv",
        "restless_periods",
        "average_breath",
        hours("total_sleep_duration_seconds").alias("total_sleep_hours"),
        hours("time_in_bed_seconds").alias("time_in_bed_hours"),
        hours("deep_sleep_duration_seconds").alias("deep_sleep_hours"),
        hours("rem_sleep_duration_seconds").alias("rem_sleep_hours"),
        hours("light_sleep_duration_seconds").alias("light_sleep_hours"),
    )


def stg_stocks_prices(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("price_id"),
        "ticker",
        "sector",
        F.col("date").alias("trade_date"),
        F.col("open").alias("open_price"),
        F.col("high").alias("high_price"),
        F.col("low").alias("low_price"),
        F.col("close").alias("close_price"),
        F.col("adj_close").alias("adj_close_price"),
        "volume",
        "fetched_at",
    )


def stg_trends_interest_over_time(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("trend_id"),
        "keyword",
        "date",
        "interest",
        "is_partial",
        "geo",
        "fetched_at",
    )


def stg_iowa_liquor_sales(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("invoice_and_item_number").alias("sale_id"),
        F.col("store_number").alias("store_id"),
        F.col("category").alias("category_id"),
        F.col("vendor_number").alias("vendor_id"),
        F.col("item_number").alias("item_id"),
        "store_name",
        F.col("address").alias("store_address"),
        F.col("city").alias("store_city"),
        F.col("zip_code").alias("store_zip"),
        "county",
        "category_name",
        "vendor_name",
        "item_description",
        "pack",
        "bottle_volume_ml",
        "bottles_sold",
        "state_bottle_cost",
        "state_bottle_retail",
        "sale_dollars",
        "volume_sold_liters",
        "volume_sold_gallons",
        "date",
        "sale_month",
        "sale_year",
    )


# full_dag registration map: staging name → (raw key, builder)
STAGING_MODELS = {
    "stg_linear_issues": ("linear_issues", stg_linear_issues),
    "stg_linear_users": ("linear_users", stg_linear_users),
    "stg_linear_cycles": ("linear_cycles", stg_linear_cycles),
    "stg_github_pull_requests": ("github_prs", stg_github_pull_requests),
    "stg_github_users": ("github_users", stg_github_users),
    "stg_github_pr_reviews": ("github_reviews", stg_github_pr_reviews),
    "stg_github_pr_comments": ("github_comments", stg_github_pr_comments),
    "stg_oura_sleep": ("oura_sleep", stg_oura_sleep),
    "stg_oura_daily_readiness": ("oura_readiness", stg_oura_daily_readiness),
    "stg_oura_daily_activity": ("oura_activity", stg_oura_daily_activity),
    "stg_oura_sleep_sessions": ("oura_sessions", stg_oura_sleep_sessions),
    "stg_stocks_prices": ("stock_prices", stg_stocks_prices),
    "stg_trends_interest_over_time": ("trends_interest", stg_trends_interest_over_time),
    "stg_iowa_liquor_sales": ("iowa_sales", stg_iowa_liquor_sales),
}
