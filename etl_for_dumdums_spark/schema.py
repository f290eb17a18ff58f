"""Raw-table schema registry: the reference's 17 declared ingestion schemas
as StructTypes (FIXTURES.md; originals are bigquery.SchemaField lists in
/root/reference/sources/*.py — e.g. linear.py:139-160, stocks.py:38-60).

BigQuery→Spark type mapping per SURVEY.md §1.2: STRING→StringType,
INTEGER→LongType, FLOAT→DoubleType, BOOLEAN→BooleanType,
TIMESTAMP→TimestampType, DATE→DateType, STRING REPEATED→ArrayType(String).
REQUIRED → nullable=False.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


_S, _L, _D, _B = T.StringType(), T.LongType(), T.DoubleType(), T.BooleanType()
_TS, _DT = T.TimestampType(), T.DateType()


RAW_SCHEMAS: dict[str, T.StructType] = {
    # linear (sources/linear.py:139-160, 201-214, 233-245)
    "linear.raw_issues": T.StructType(
        [
            _f("id", _S, False),
            _f("identifier", _S),
            _f("title", _S),
            _f("state", _S),
            _f("assignee_id", _S),
            _f("priority", _L),
            _f("estimate", _D),
            _f("created_at", _TS),
            _f("updated_at", _TS),
            _f("project_name", _S),
            _f("labels", T.ArrayType(_S)),
            _f("cycle_id", _S),
            _f("parent_id", _S),
            _f("parent_identifier", _S),
        ]
    ),
    "linear.raw_users": T.StructType(
        [_f("id", _S, False), _f("email", _S), _f("display_name", _S), _f("name", _S), _f("active", _B)]
    ),
    "linear.raw_cycles": T.StructType(
        [
            _f("id", _S, False),
            _f("number", _L),
            _f("name", _S),
            _f("starts_at", _TS),
            _f("ends_at", _TS),
            _f("team_name", _S),
        ]
    ),
    # github (sources/github.py:114-126, 184-207, 353-367, 417-432)
    "github.raw_users": T.StructType(
        [_f("id", _S, False), _f("login", _S), _f("email", _S), _f("name", _S), _f("avatar_url", _S)]
    ),
    "github.raw_pull_requests": T.StructType(
        [
            _f("id", _S, False),
            _f("number", _L),
            _f("repo", _S),
            _f("title", _S),
            _f("state", _S),
            _f("merged", _B),
            _f("draft", _B),
            _f("author_id", _S),
            _f("created_at", _TS),
            _f("updated_at", _TS),
            _f("merged_at", _TS),
            _f("closed_at", _TS),
            _f("ready_for_review_at", _TS),
            _f("additions", _L),
            _f("deletions", _L),
            _f("changed_files", _L),
        ]
    ),
    "github.raw_pr_reviews": T.StructType(
        [
            _f("id", _S, False),
            _f("pull_request_id", _S),
            _f("repo", _S),
            _f("author_id", _S),
            _f("state", _S),
            _f("submitted_at", _TS),
            _f("body", _S),
        ]
    ),
    "github.raw_pr_comments": T.StructType(
        [
            _f("id", _S, False),
            _f("pull_request_id", _S),
            _f("repo", _S),
            _f("author_id", _S),
            _f("created_at", _TS),
            _f("updated_at", _TS),
            _f("path", _S),
            _f("body", _S),
        ]
    ),
    # oura (sources/oura.py:80-101, 139-168, 214-233, 273-298)
    "oura.raw_sleep": T.StructType(
        [_f("id", _S, False), _f("day", _DT), _f("score", _L)]
        + [
            _f(f"contributor_{c}", _L)
            for c in (
                "deep_sleep",
                "efficiency",
                "latency",
                "rem_sleep",
                "restfulness",
                "timing",
                "total_sleep",
            )
        ]
    ),
    "oura.raw_sleep_sessions": T.StructType(
        [
            _f("id", _S, False),
            _f("day", _DT),
            _f("bedtime_start", _TS),
            _f("bedtime_end", _TS),
            _f("sleep_type", _S),
            _f("total_sleep_duration_seconds", _L),
            _f("time_in_bed_seconds", _L),
            _f("awake_time_seconds", _L),
            _f("light_sleep_duration_seconds", _L),
            _f("deep_sleep_duration_seconds", _L),
            _f("rem_sleep_duration_seconds", _L),
            _f("latency_seconds", _L),
            _f("efficiency", _L),
            _f("average_heart_rate", _D),
            _f("lowest_heart_rate", _L),
            _f("average_hrv", _L),
            _f("restless_periods", _L),
            _f("average_breath", _D),
        ]
    ),
    "oura.raw_daily_readiness": T.StructType(
        [_f("id", _S, False), _f("day", _DT), _f("score", _L), _f("temperature_deviation", _D)]
        + [
            _f(f"contributor_{c}", _L)
            for c in (
                "activity_balance",
                "body_temperature",
                "hrv_balance",
                "previous_day_activity",
                "previous_night",
                "recovery_index",
                "resting_heart_rate",
                "sleep_balance",
            )
        ]
    ),
    "oura.raw_daily_activity": T.StructType(
        [
            _f("id", _S, False),
            _f("day", _DT),
            _f("score", _L),
            _f("active_calories", _L),
            _f("total_calories", _L),
            _f("steps", _L),
            _f("equivalent_walking_distance", _L),
            _f("high_activity_time", _L),
            _f("medium_activity_time", _L),
            _f("low_activity_time", _L),
            _f("sedentary_time", _L),
            _f("resting_time", _L),
        ]
        + [
            _f(f"contributor_{c}", _L)
            for c in (
                "meet_daily_targets",
                "move_every_hour",
                "recovery_time",
                "stay_active",
                "training_frequency",
                "training_volume",
            )
        ]
    ),
    # hacker_news (sources/hacker_news.py:30-50, 232-257)
    "hacker_news.raw_stories": T.StructType(
        [
            _f("id", _L, False),
            _f("title", _S),
            _f("url", _S),
            _f("domain", _S),
            _f("author", _S),
            _f("score", _L),
            _f("descendants", _L),
            _f("posted_at", _TS),
            _f("posted_week", _DT),
        ]
    ),
    "hacker_news.raw_comments": T.StructType(
        [
            _f("id", _L, False),
            _f("parent_id", _L),
            _f("story_id", _L),
            _f("author", _S),
            _f("text", _S),
            _f("posted_at", _TS),
            _f("posted_month", _DT),
            _f("sentiment_score", _D),
            _f("sentiment_label", _S),
            _f("sentiment_category", _S),
            _f("posted_day", _DT),
        ]
    ),
    # trends (sources/trends.py:36-55)
    "trends.raw_interest_over_time": T.StructType(
        [
            _f("id", _S, False),
            _f("keyword", _S, False),
            _f("date", _DT, False),
            _f("interest", _L),
            _f("is_partial", _B),
            _f("geo", _S),
            _f("fetched_at", _TS),
        ]
    ),
    # fda_food (sources/fda_food.py:27-58, fda_food_events.py:29-58)
    "fda_food.raw_recalls": T.StructType(
        [
            _f("recall_number", _S, False),
            _f("event_id", _L),
            _f("classification", _S),
            _f("status", _S),
            _f("voluntary_mandated", _S),
            _f("recalling_firm", _S),
            _f("city", _S),
            _f("state", _S),
            _f("country", _S),
            _f("postal_code", _S),
            _f("reason_for_recall", _S),
            _f("product_description", _S),
            _f("product_quantity", _S),
            _f("distribution_pattern", _S),
            _f("recall_initiation_date", _DT),
            _f("center_classification_date", _DT),
            _f("report_date", _DT),
            _f("termination_date", _DT),
        ]
    ),
    "fda_food.raw_food_events": T.StructType(
        [
            _f("report_number", _S, False),
            _f("reactions", _S),
            _f("outcomes", _S),
            _f("products_brand_name", _S),
            _f("products_industry_code", _S),
            _f("products_role", _S),
            _f("products_industry_name", _S),
            _f("date_created", _DT),
            _f("date_started", _DT),
            _f("consumer_gender", _S),
            _f("consumer_age", _D),
            _f("consumer_age_unit", _S),
        ]
    ),
    # iowa_liquor (sources/iowa_liquor.py:23-59)
    "iowa_liquor.raw_sales": T.StructType(
        [
            _f("invoice_and_item_number", _S, False),
            _f("date", _DT),
            _f("store_number", _S),
            _f("store_name", _S),
            _f("address", _S),
            _f("city", _S),
            _f("zip_code", _S),
            _f("county", _S),
            _f("category", _S),
            _f("category_name", _S),
            _f("vendor_number", _S),
            _f("vendor_name", _S),
            _f("item_number", _S),
            _f("item_description", _S),
            _f("pack", _L),
            _f("bottle_volume_ml", _L),
            _f("bottles_sold", _L),
            _f("state_bottle_cost", _D),
            _f("state_bottle_retail", _D),
            _f("sale_dollars", _D),
            _f("volume_sold_liters", _D),
            _f("volume_sold_gallons", _D),
            _f("sale_month", _DT),
            _f("sale_year", _L),
        ]
    ),
    # stocks (sources/stocks.py:38-60)
    "stocks.raw_prices": T.StructType(
        [
            _f("id", _S, False),
            _f("ticker", _S, False),
            _f("sector", _S),
            _f("date", _DT, False),
            _f("open", _D),
            _f("high", _D),
            _f("low", _D),
            _f("close", _D),
            _f("adj_close", _D),
            _f("volume", _L),
            _f("fetched_at", _TS),
        ]
    ),
}

PRIMARY_KEYS: dict[str, str] = {
    "linear.raw_issues": "id",
    "linear.raw_users": "id",
    "linear.raw_cycles": "id",
    "github.raw_users": "id",
    "github.raw_pull_requests": "id",
    "github.raw_pr_reviews": "id",
    "github.raw_pr_comments": "id",
    "oura.raw_sleep": "id",
    "oura.raw_sleep_sessions": "id",
    "oura.raw_daily_readiness": "id",
    "oura.raw_daily_activity": "id",
    "hacker_news.raw_stories": "id",
    "hacker_news.raw_comments": "id",
    "trends.raw_interest_over_time": "id",
    "fda_food.raw_recalls": "recall_number",
    "fda_food.raw_food_events": "report_number",
    "iowa_liquor.raw_sales": "invoice_and_item_number",
    "stocks.raw_prices": "id",
}
